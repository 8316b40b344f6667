#!/usr/bin/env bash
# Extract wav2vec features for the IWSLT2023 recipes with
# examples/IWSLT2023/extract_features.py (reference: prepare.sh).
# Usage: examples/IWSLT2023/prepare.sh w2v2nima|xlsr128
set -e

MODEL=$1
DATA_DIR=data/iwslt2023
mkdir -p "${DATA_DIR}"

case "${MODEL}" in
  w2v2nima)
    REPO=https://huggingface.co/LIA-AvignonUniversity/IWSLT2022-Niger-Mali
    LAYER=8 ;;
  xlsr128)
    REPO=https://huggingface.co/facebook/wav2vec2-xls-r-300m
    LAYER=18 ;;
  *)
    echo "Usage: $0 w2v2nima|xlsr128" >&2; exit 1 ;;
esac

MODEL_DIR=${DATA_DIR}/${MODEL}
if [ ! -d "${MODEL_DIR}" ]; then
    git lfs install
    git clone "${REPO}" "${MODEL_DIR}"
fi
FEAT_DIR=${MODEL_DIR}-${LAYER}
EXTRACT="python3 examples/IWSLT2023/extract_features.py ${MODEL_DIR} --layer-id ${LAYER}"

# Tamasheq-French
mkdir -p "${FEAT_DIR}/tamasheq"
for split in train valid test; do
    seg_dir=${DATA_DIR}/IWSLT2022_Tamasheq_data/taq_fra_clean/${split}
    out=${FEAT_DIR}/tamasheq/${split}.npy.taq
    [ -s "${out}" ] && continue
    cut -f1,3,4 -d' ' "${seg_dir}/txt/segments" | \
        ${EXTRACT} --audio-dirs "${seg_dir}" \
        --txt-file "${seg_dir}/txt/${split}.fra" \
        -o "${out}" > "${FEAT_DIR}/tamasheq/${split}.fr"
done

# Quechua-Spanish
mkdir -p "${FEAT_DIR}/quechua"
for split in train valid; do
    seg_dir=${DATA_DIR}/IWSLT2023_Quechua_data/que_spa_clean/${split}
    out=${FEAT_DIR}/quechua/${split}.npy.que
    [ -s "${out}" ] && continue
    awk '{print $1, $(NF-1), $NF}' "${seg_dir}/txt/segments" | \
        ${EXTRACT} --audio-dirs "${seg_dir}" \
        --txt-file "${seg_dir}/txt/${split}.spa" \
        -o "${out}" > "${FEAT_DIR}/quechua/${split}.es"
done

# mTEDx ASR + ST pairs
for pair in es-en es-es es-fr es-it es-pt fr-en fr-es fr-fr fr-pt it-en \
            it-es it-it pt-en pt-es pt-pt; do
    src=${pair%-*}; tgt=${pair#*-}
    mkdir -p "${FEAT_DIR}/mtedx/${pair}"
    for split in train valid test iwslt2021; do
        seg_dir=${DATA_DIR}/mtedx/${pair}/data/${split}
        [ -d "${seg_dir}" ] || continue
        out=${FEAT_DIR}/mtedx/${pair}/${split}.npy.${src}
        [ -s "${out}" ] && continue
        cut -f1,3,4 -d' ' "${seg_dir}/txt/segments" | \
            ${EXTRACT} --audio-dirs "${seg_dir}" --file-extension .flac \
            --txt-file "${seg_dir}/txt/${split}.${tgt}" \
            -o "${out}" > "${FEAT_DIR}/mtedx/${pair}/${split}.${tgt}"
    done
done

# TED-LIUM English ASR: build segments + transcripts from the stm files,
# then extract features with transcript alignment via --txt-file
mkdir -p "${FEAT_DIR}/ted-lium"
for split in train; do
    seg_dir=${DATA_DIR}/TEDLIUM_release2/${split}
    out=${FEAT_DIR}/ted-lium/${split}.npy.en
    [ -d "${seg_dir}" ] || continue
    [ -s "${out}" ] && continue
    python3 - "${seg_dir}" "${FEAT_DIR}/ted-lium/${split}" <<'EOF'
import os, sys
seg_dir, prefix = sys.argv[1], sys.argv[2]
with open(prefix + ".segments", "w") as segf, \
     open(prefix + ".transcripts", "w") as txtf:
    for stm in sorted(os.listdir(os.path.join(seg_dir, "stm"))):
        for line in open(os.path.join(seg_dir, "stm", stm)):
            parts = line.split(None, 6)
            if len(parts) < 7 or "ignore_time_segment" in line:
                continue
            name, _, _, start, end, _, text = parts
            segf.write(f"{name} {start} {end}\n")
            txtf.write(" ".join(text.split()) + "\n")
EOF
    ${EXTRACT} --audio-dirs "${seg_dir}/sph" \
        --txt-file "${FEAT_DIR}/ted-lium/${split}.transcripts" \
        -o "${out}" < "${FEAT_DIR}/ted-lium/${split}.segments" \
        > "${FEAT_DIR}/ted-lium/${split}.en"
done
echo "features ready under ${FEAT_DIR}"
