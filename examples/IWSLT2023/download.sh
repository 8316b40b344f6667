#!/usr/bin/env bash
# Fetch the IWSLT2023 low-resource track data: mTEDx, TED-LIUM v2, and the
# IWSLT Tamasheq/Quechua releases (reference: examples/IWSLT2023/download.sh).
set -e

command -v sox >/dev/null || {
    echo "sox is required to convert TED-LIUM sph audio" >&2; exit 1; }

DATA_DIR=data/iwslt2023
mkdir -p "${DATA_DIR}"
cd "${DATA_DIR}"

wget -qnc https://www.openslr.org/resources/100/mtedx_iwslt2021.tgz
tar xzf mtedx_iwslt2021.tgz
mv mtedx_iwslt2021 mtedx

for lang in es-en es-fr es-it es-pt fr-en fr-es fr-pt pt-en pt-es it-en \
            it-es fr pt es it; do
    wget -qnc "https://www.openslr.org/resources/100/mtedx_${lang}.tgz"
    tar xzf "mtedx_${lang}.tgz" -C mtedx
done

wget -qnc --no-check-certificate \
    https://projets-lium.univ-lemans.fr/wp-content/uploads/corpus/TED-LIUM/TEDLIUM_release2.tar.gz
tar xzf TEDLIUM_release2.tar.gz
for f in TEDLIUM_release2/*/sph/*.sph; do
    sox -t sph "$f" -r 16000 -c 1 -b 16 -e signed-integer "${f%.*}.wav"
done

[ -d IWSLT2022_Tamasheq_data ] || \
    git clone https://github.com/mzboito/IWSLT2022_Tamasheq_data.git
[ -d IWSLT2023_Quechua_data ] || \
    git clone https://github.com/Llamacha/IWSLT2023_Quechua_data.git

# NLLB 1.3B distilled (text init for the ST encoder-decoder)
wget -qnc https://tinyurl.com/nllb200densedst1bcheckpoint \
    -O nllb_1.3B_distilled.bin
echo "IWSLT2023 data ready under ${DATA_DIR}"
