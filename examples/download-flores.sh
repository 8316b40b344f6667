#!/usr/bin/env bash
# Fetch FLORES-200 and lay out FLORES-valid.LANG / FLORES-test.LANG files,
# with symlinks for the FLORES-101 / M2M-100 / ParaCrawl lang codes
# (reference: examples/download-flores.sh).
set -e

DATA_DIR=${1:-data/FLORES}
[ -d "${DATA_DIR}" ] && exit 0

mkdir -p "${DATA_DIR}"
cd "${DATA_DIR}"
wget --trust-server-names https://tinyurl.com/flores200dataset
tar xzf flores200_dataset.tar.gz

python3 - <<'EOF'
"""Normalize whitespace, write FLORES-{valid,test}.LANG for every language in
the release, and symlink 2/3-letter aliases (FLORES-101, M2M-100, ParaCrawl)."""
import os

for split, src in (("valid", "dev"), ("test", "devtest")):
    d = os.path.join("flores200_dataset", src)
    for fname in sorted(os.listdir(d)):
        lang = fname.rsplit(".", 1)[0]
        with open(os.path.join(d, fname)) as f:
            lines = [" ".join(line.split()) for line in f]
        with open(f"FLORES-{split}.{lang}", "w") as f:
            f.writelines(line + "\n" for line in lines)

# FLORES-200 code -> alias codes used by FLORES-101 / M2M-100 / ParaCrawl
ALIASES = {
    "afr_Latn": ["af", "afr"], "als_Latn": ["sq"], "amh_Ethi": ["am", "amh"],
    "arb_Arab": ["ar", "ara"], "asm_Beng": ["asm"], "ast_Latn": ["ast"],
    "azj_Latn": ["az", "azj"], "bak_Cyrl": ["ba"], "bel_Cyrl": ["be", "bel"],
    "ben_Beng": ["bn", "ben"], "bos_Latn": ["bs", "bos"],
    "bul_Cyrl": ["bg", "bul"], "cat_Latn": ["ca", "cat"],
    "ceb_Latn": ["ceb"], "ces_Latn": ["cs", "ces"], "ckb_Arab": ["ckb"],
    "cym_Latn": ["cy", "cym"], "dan_Latn": ["da", "dan"],
    "deu_Latn": ["de", "deu"], "ell_Grek": ["el", "ell"],
    "eng_Latn": ["en", "eng"], "est_Latn": ["et", "est"],
    "eus_Latn": ["eu"], "fin_Latn": ["fi", "fin"], "fra_Latn": ["fr", "fra"],
    "fuv_Latn": ["ff", "ful"], "gaz_Latn": ["orm"], "gla_Latn": ["gd"],
    "gle_Latn": ["ga", "gle"], "glg_Latn": ["gl", "glg"],
    "guj_Gujr": ["gu", "guj"], "hat_Latn": ["ht"], "hau_Latn": ["ha", "hau"],
    "heb_Hebr": ["he", "heb"], "hin_Deva": ["hi", "hin"],
    "hrv_Latn": ["hr", "hrv"], "hun_Latn": ["hu", "hun"],
    "hye_Armn": ["hy", "hye"], "ibo_Latn": ["ig", "ibo"],
    "ilo_Latn": ["ilo"], "ind_Latn": ["id", "ind"],
    "isl_Latn": ["is", "isl"], "ita_Latn": ["it", "ita"],
    "jav_Latn": ["jv", "jav"], "jpn_Jpan": ["ja", "jpn"],
    "kam_Latn": ["kam"], "kan_Knda": ["kn", "kan"],
    "kat_Geor": ["ka", "kat"], "kaz_Cyrl": ["kk", "kaz"],
    "kea_Latn": ["kea"], "khk_Cyrl": ["mn", "mon"],
    "khm_Khmr": ["km", "khm"], "kir_Cyrl": ["kir"],
    "kor_Hang": ["ko", "kor"], "lao_Laoo": ["lo", "lao"],
    "lin_Latn": ["ln", "lin"], "lit_Latn": ["lt", "lit"],
    "ltz_Latn": ["lb", "ltz"], "lug_Latn": ["lg", "lug"],
    "luo_Latn": ["luo"], "lvs_Latn": ["lv", "lav"],
    "mal_Mlym": ["ml", "mal"], "mar_Deva": ["mr", "mar"],
    "mkd_Cyrl": ["mk", "mkd"], "mlt_Latn": ["mt", "mlt"],
    "mri_Latn": ["mri"], "mya_Mymr": ["my", "mya"],
    "nld_Latn": ["nl", "nld"], "nob_Latn": ["no", "nb", "nob"],
    "npi_Deva": ["ne", "npi"], "nso_Latn": ["ns", "nso"],
    "nya_Latn": ["nya"], "oci_Latn": ["oc", "oci"],
    "ory_Orya": ["or", "ory"], "pan_Guru": ["pa", "pan"],
    "pbt_Arab": ["ps", "pus"], "pes_Arab": ["fa", "fas"],
    "plt_Latn": ["mg"], "pol_Latn": ["pl", "pol"],
    "por_Latn": ["pt", "por"], "ron_Latn": ["ro", "ron"],
    "rus_Cyrl": ["ru", "rus"], "sin_Sinh": ["si"],
    "slk_Latn": ["sk", "slk"], "slv_Latn": ["sl", "slv"],
    "sna_Latn": ["sna"], "snd_Arab": ["sd", "snd"],
    "som_Latn": ["so", "som"], "spa_Latn": ["es", "spa"],
    "srp_Cyrl": ["sr", "srp"], "ssw_Latn": ["ss"], "sun_Latn": ["su"],
    "swe_Latn": ["sv", "swe"], "swh_Latn": ["sw", "swh"],
    "tam_Taml": ["ta", "tam"], "tel_Telu": ["tel"],
    "tgk_Cyrl": ["tgk"], "tgl_Latn": ["tl", "tgl"],
    "tha_Thai": ["th", "tha"], "tsn_Latn": ["tn"],
    "tur_Latn": ["tr", "tur"], "ukr_Cyrl": ["uk", "ukr"],
    "umb_Latn": ["umb"], "urd_Arab": ["ur", "urd"],
    "uzn_Latn": ["uz", "uzb"], "vie_Latn": ["vi", "vie"],
    "wol_Latn": ["wo", "wol"], "xho_Latn": ["xh", "xho"],
    "ydd_Hebr": ["yi"], "yor_Latn": ["yo", "yor"],
    "zho_Hans": ["zh", "zho_simpl"], "zho_Hant": ["zho_trad"],
    "zsm_Latn": ["ms", "msa"], "zul_Latn": ["zu", "zul"],
}
for orig, aliases in ALIASES.items():
    for split in ("valid", "test"):
        target = f"FLORES-{split}.{orig}"
        if not os.path.exists(target):
            continue
        for alias in aliases:
            link = f"FLORES-{split}.{alias}"
            if not os.path.lexists(link):
                os.symlink(target, link)
print("FLORES-200 ready")
EOF

rm -rf flores200_dataset
