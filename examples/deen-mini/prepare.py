#!/usr/bin/env python3
"""Build the deen-mini corpus: hand-written de-en pairs + deterministic
slot-template expansion -> train/valid/test splits + tokenizer + dict.

This is the in-tree real-data quality recipe (reference analogue: the TED
example, /root/reference/examples/TED/README.md — which needs a network
download; this corpus is authored in-repo and fully redistributable).
The held-out valid/test sets contain only hand-written sentences the
templates never produce, so BLEU measures genuine generalization over
German word order, case, tense and vocabulary — not slot memorization.

Usage: python prepare.py [-o DATA_DIR]
"""

import argparse
import itertools
import os
import random

HERE = os.path.dirname(os.path.abspath(__file__))

SLOTS = {
    "WD": [("Montag", "Monday"), ("Dienstag", "Tuesday"),
           ("Mittwoch", "Wednesday"), ("Donnerstag", "Thursday"),
           ("Freitag", "Friday"), ("Samstag", "Saturday"),
           ("Sonntag", "Sunday")],
    "MON": [("Januar", "January"), ("März", "March"), ("Mai", "May"),
            ("Juli", "July"), ("September", "September"),
            ("Oktober", "October"), ("Dezember", "December")],
    "CITY": [("Berlin", "Berlin"), ("Hamburg", "Hamburg"),
             ("München", "Munich"), ("Köln", "Cologne"), ("Wien", "Vienna"),
             ("Zürich", "Zurich"), ("Paris", "Paris"), ("Rom", "Rome")],
    "NAME": [("Anna", "Anna"), ("Peter", "Peter"), ("Maria", "Maria"),
             ("Thomas", "Thomas"), ("Julia", "Julia"), ("Stefan", "Stefan")],
    "NUM": [("zwei", "two"), ("drei", "three"), ("vier", "four"),
            ("fünf", "five"), ("sechs", "six"), ("acht", "eight"),
            ("zehn", "ten"), ("zwölf", "twelve"), ("zwanzig", "twenty")],
    "HOUR": [("sieben", "seven"), ("acht", "eight"), ("neun", "nine"),
             ("zehn", "ten"), ("elf", "eleven"), ("sechs", "six")],
    "FOOD": [("eine Gemüsesuppe", "a vegetable soup"),
             ("einen Salat", "a salad"), ("frischen Fisch", "fresh fish"),
             ("Nudeln mit Tomatensoße", "pasta with tomato sauce")],
    "FOOD_PL": [("Äpfel", "apples"), ("Tomaten", "tomatoes"),
                ("Eier", "eggs"), ("Brötchen", "bread rolls")],
    "TOPIC": [("Geschichte", "history"), ("Musik", "music"),
              ("Politik", "politics"), ("Astronomie", "astronomy"),
              ("Architektur", "architecture")],
    "LANG": [("Deutsch", "German"), ("Spanisch", "Spanish"),
             ("Französisch", "French"), ("Japanisch", "Japanese")],
    "SPORT": [("schwimmen", "swimming"), ("wandern", "hiking"),
              ("klettern", "climbing")],
    "INSTR": [("Klavier", "piano"), ("Geige", "violin"),
              ("Gitarre", "guitar")],
    "CENT": [("dem neunzehnten Jahrhundert", "the nineteenth century"),
             ("dem Mittelalter", "the Middle Ages")],
}


def read_tsv(path):
    pairs = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            src, tgt = line.split("\t")
            pairs.append((src, tgt))
    return pairs


def expand_templates(templates, per_template, rng, held_out: int = 0):
    """Instantiate each template with `per_template` random slot fillings
    (aligned de/en values, deterministic rng).  ``held_out`` additional
    *disjoint* instantiations per template are returned separately — unseen
    slot combinations over fully-covered vocabulary, the generalization
    test set."""
    out, held = [], []
    for src, tgt in templates:
        slots = sorted({name.rsplit("_", 1)[0]
                        for name in _slot_names(src + tgt)})
        combos = list(itertools.product(
            *[range(len(SLOTS[s])) for s in slots]))
        rng.shuffle(combos)

        def fill(combo):
            s, t = src, tgt
            for slot, idx in zip(slots, combo):
                de, en = SLOTS[slot][idx]
                s = s.replace(f"{{{slot}_DE}}", de).replace(f"{{{slot}}}", de)
                t = t.replace(f"{{{slot}_EN}}", en).replace(f"{{{slot}}}", en)
            return s, t

        out += [fill(c) for c in combos[:per_template]]
        held += [fill(c) for c in combos[per_template:per_template + held_out]]
    return out, held


def _slot_names(text):
    import re
    return re.findall(r"\{([A-Z_]+)\}", text)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default=os.path.join(HERE, "data"))
    parser.add_argument("--per-template", type=int, default=60)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = random.Random(args.seed)
    hand = read_tsv(os.path.join(HERE, "handwritten.tsv"))
    templates = read_tsv(os.path.join(HERE, "templates.tsv"))

    rng.shuffle(hand)
    # valid/test: UNSEEN template instantiations (every word attested in
    # training, so the scores measure composition, not lexical luck);
    # test_hard: held-out hand-written sentences with open vocabulary
    n_hard = 100
    hard, hand_train = hand[:n_hard], hand[n_hard:]
    expanded, held = expand_templates(templates, args.per_template, rng,
                                      held_out=10)
    rng.shuffle(held)
    valid, test = held[:80], held[80:]
    # repeat the hand-written training pairs so the natural sentences are
    # not drowned out by the template expansions
    train = hand_train * 3 + expanded
    rng.shuffle(train)

    os.makedirs(args.output, exist_ok=True)
    for name, rows in (("train", train), ("valid", valid), ("test", test),
                       ("test_hard", hard)):
        with open(os.path.join(args.output, f"{name}.de"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(s for s, _ in rows) + "\n")
        with open(os.path.join(args.output, f"{name}.en"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(t for _, t in rows) + "\n")
    print(f"deen-mini: {len(train)} train / {len(valid)} valid / "
          f"{len(test)} test / {len(hard)} test_hard pairs in {args.output}")


if __name__ == "__main__":
    main()
