#!/usr/bin/env bash
# Fetch the TED talks corpus (phontron.com release) and split the TSVs into
# per-language train/valid/test files (reference: examples/download-TED.sh).
set -e

DATA_DIR=${1:-data/TED}
mkdir -p "${DATA_DIR}/archives"
cd "${DATA_DIR}"

wget -qnc http://phontron.com/data/ted_talks.tar.gz -P archives
tar xzf archives/ted_talks.tar.gz

python3 - <<'EOF'
"""Split all_talks_{train,dev,test}.tsv into per-language line files,
de-escape HTML entities, drop NULL rows, build {valid,test}.LANG-en pairs."""
import html
import random
import re

random.seed(0)

def clean(cell):
    cell = html.unescape(cell)
    if "NULL" in cell:
        return ""
    return " ".join(cell.split())

splits = {"train": "all_talks_train.tsv", "valid": "all_talks_dev.tsv",
          "test": "all_talks_test.tsv"}
drop = {"talk_name", "calv"}
langs = None
for split, path in splits.items():
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in f]
    if split == "train":
        random.shuffle(rows)
    cols = {lang: i for i, lang in enumerate(header)}
    langs = [l for l in header if l not in drop]
    for lang in langs:
        out = lang.replace("-", "_")
        with open(f"{split}.{out}", "w") as f:
            for row in rows:
                f.write(clean(row[cols[lang]]) + "\n")

langs = [l.replace("-", "_") for l in langs]
for split in ("valid", "test"):
    en = open(f"{split}.en").read().splitlines()
    for lang in langs:
        if lang == "en":
            continue
        src = open(f"{split}.{lang}").read().splitlines()
        keep = [(s, e) for s, e in zip(src, en) if s and e]
        with open(f"{split}.{lang}-en.{lang}", "w") as f:
            f.writelines(s + "\n" for s, _ in keep)
        with open(f"{split}.{lang}-en.en", "w") as f:
            f.writelines(e + "\n" for _, e in keep)
print(f"TED corpus ready: {len(langs)} languages")
EOF

rm -f all_talks_{train,dev,test}.tsv
cd - >/dev/null
# existing tokenizers for the worked examples
cp -r examples/TED/de-en "${DATA_DIR}" 2>/dev/null || true
cp -r examples/TED-top20/top20 "${DATA_DIR}" 2>/dev/null || true
