#!/usr/bin/env python3
"""Regenerate the reference-execution parity fixtures.

Executes the REFERENCE implementation (/root/reference/pk_el — public,
behavior only) over all real inputs and vendors its outputs as test fixtures:

  src/test/resources/pkel/ref_tokens.json  — input -> pk_tokenizer tokens
  src/test/resources/pkel/ref_exact.json   — exact-tier (y_pred, status) per
                                             test mention

The reference's external deps are unavailable offline, so stand-ins are
injected into sys.modules BEFORE importing pk_el:

  * drug_named_entity_recognition.find_drugs — the load-bearing one: a
    dictionary lookup over the engine's vendored lexicon
    (src/main/resources/pkel/drug_lexicon.txt), with the same semantics the
    Scala kernel implements (token in lexicon, compared lowercased). Both
    sides read the SAME file, so blocking keys agree by construction —
    including on drug-bearing mentions the round-2 stub missed.
  * nltk / tqdm / sklearn / matplotlib / seaborn / spacy — import-time only;
    none participate in the pk tokenizer or exact-linker control flow.

Usage:  python3 tools/gen_parity_fixtures.py [--lexicon <path>] [--check]
  --check: only verify that regenerating with the current lexicon reproduces
           the committed fixtures (no writes).
"""
import argparse
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
LEXICON = os.path.join(REPO, "src/main/resources/pkel/drug_lexicon.txt")
TOKENS_OUT = os.path.join(REPO, "src/test/resources/pkel/ref_tokens.json")
EXACT_OUT = os.path.join(REPO, "src/test/resources/pkel/ref_exact.json")
FIXTURES = os.path.join(REPO, "src/test/resources/pkel/data")

# Extra parity cases carrying lexicon drug names that the round-2 stub did
# not cover — pins that drug removal actually fires inside mention spans.
DRUG_BEARING_CASES = [
    "itraconazole clearance",
    "clearance of voriconazole",
    "midazolam AUC0-24",
    "tacrolimus trough concentration",
    "apparent volume of distribution of posaconazole",
    "elimination half-life of levofloxacin",
    "Cmax of rivaroxaban",
    "AUC0-∞ of caffeine after rifampicin",
]


def install_fakes(lexicon_path):
    lex = set()
    with open(lexicon_path) as f:
        for line in f:
            line = line.strip()
            if line:
                lex.add(line.lower())

    dner = types.ModuleType("drug_named_entity_recognition")

    def find_drugs(tokens, **kwargs):
        # (match_info, span, token_index) triples; only [2] is consumed by
        # pk_tokenizer.remove_drugnames
        return [({"name": t}, None, i)
                for i, t in enumerate(tokens) if t.lower() in lex]

    dner.find_drugs = find_drugs
    sys.modules["drug_named_entity_recognition"] = dner

    for name in ["nltk", "tqdm", "seaborn", "matplotlib", "matplotlib.pyplot",
                 "sklearn", "sklearn.metrics", "spacy", "bs4"]:
        m = types.ModuleType(name)
        sys.modules[name] = m
    sys.modules["tqdm"].tqdm = lambda it, **kw: it
    sys.modules["nltk"].word_tokenize = lambda s: s.split()
    for fn in ["precision_score", "recall_score", "f1_score",
               "accuracy_score", "confusion_matrix"]:
        setattr(sys.modules["sklearn.metrics"], fn, lambda *a, **k: None)
    sys.modules["matplotlib"].pyplot = sys.modules["matplotlib.pyplot"]
    sys.modules["spacy"].load = lambda *a, **k: (lambda text: [])
    sys.modules["bs4"].BeautifulSoup = None  # import-time only
    uj = types.ModuleType("ujson")
    uj.loads, uj.dumps = json.loads, json.dumps
    sys.modules["ujson"] = uj
    return lex


def read_jsonl(path):
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def gen_tokens(pk_tokenizer, basic_preprocessing, onto_df):
    inputs = []
    seen = set()

    def add(s):
        if s and s not in seen:
            seen.add(s)
            inputs.append(s)

    # carry over the committed corpus's input strings (some spellings — raw
    # unstripped synonyms, the empty string — came from earlier collection
    # passes; the INPUT list is just the comparison corpus, only the token
    # OUTPUTS are reference-derived and regenerated below)
    if os.path.exists(TOKENS_OUT):
        for rec in json.load(open(TOKENS_OUT)):
            s = rec["input"]
            if s not in seen:
                seen.add(s)
                inputs.append(s)

    for _, row in onto_df.iterrows():
        add(row["parameter_name"])
        syns = row.get("parameter_synonyms")
        if isinstance(syns, list):
            for s in syns:
                add(s)
    # raw (unstripped) synonym spellings straight from the CSV — load_ontology
    # trims them, but the tokenizer must behave identically on the raw forms
    # (incl. trailing-space variants and the empty string)
    import ast
    import csv as _csv
    with open(f"{REF}/pk_ontology/pk_kb.csv") as f:
        for row in _csv.DictReader(f):
            try:
                raw = ast.literal_eval(row.get("parameter_synonyms") or "[]")
            except (ValueError, SyntaxError):
                raw = []
            if isinstance(raw, list):
                for s in raw:
                    if isinstance(s, str) and (s not in seen):
                        seen.add(s)
                        inputs.append(s)
    for modality in ("sentences", "tables"):
        for split in ("test", "validation"):
            for rec in read_jsonl(f"{FIXTURES}/{modality}/{split}.jsonl"):
                span = rec["spans"][0]
                add(rec["text"][span["start"]:span["end"]])
    for s in DRUG_BEARING_CASES:
        add(s)

    out = []
    for s in inputs:
        try:
            # mirrors the reference test harness: basic_preprocessing is
            # applied before pk_tokenizer, which re-applies it (idempotent)
            toks = pk_tokenizer(basic_preprocessing(s))
        except Exception:
            toks = ["<ERROR>"]
        out.append({"input": s, "tokens": toks})
    return out


def gen_exact(el, index):
    out = []
    for modality, is_table in (("sentences", False), ("tables", True)):
        data = read_jsonl(f"{FIXTURES}/{modality}/test.jsonl")
        el.tokenize_data(data, "pk")
        for sample in data:
            span = sample["spans"][0]
            s, e = span["start"], span["end"]
            mention = sample["text"][s:e]
            if el.is_non_pk_mention(mention) or el.is_in_invalid_context(sample["text"], s, e):
                y_pred, status = "Q100", "excluded"
            else:
                result = el.find_exact_params(sample["tokens"], index, table_mention=is_table)
                if not result:
                    y_pred, status = "Q100", "unlinked"
                elif "param_id" in result:
                    y_pred, status = result["param_id"], "linked"
                else:
                    d = el.disambiguate_multiple(sample, result)
                    if d and "param_id" in d:
                        y_pred, status = d["param_id"], "disambiguated"
                    else:
                        # unresolved multiples (incl. the km '{"param_ids":
                        # "Q1"}' string quirk) are residue
                        y_pred, status = "Q100", "ambiguous"
            out.append({"modality": modality, "text": sample["text"],
                        "span_start": s, "span_end": e,
                        "y_pred": y_pred, "status": status})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lexicon", default=LEXICON)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    install_fakes(args.lexicon)
    sys.path.insert(0, REF)
    from pk_el.ontology_preprocessing import load_ontology
    from pk_el.tokenizers.pk_tokenizer import pk_tokenizer
    from pk_el.tokenizers.basic_tokenizer import basic_preprocessing
    import pk_el.linkers.exact_linker as el

    onto_df = load_ontology(f"{REF}/pk_ontology/pk_kb.csv", remove_nil=True)
    tokens = gen_tokens(pk_tokenizer, basic_preprocessing, onto_df)
    index = el.create_tokenized_param_names_and_synonyms_to_ids(onto_df, "pk")
    exact = gen_exact(el, index)

    print(f"ref_tokens: {len(tokens)} inputs; ref_exact: {len(exact)} mentions")
    if args.check:
        old_tokens = {r["input"]: r["tokens"] for r in json.load(open(TOKENS_OUT))}
        new_tokens = {r["input"]: r["tokens"] for r in tokens}
        diff = [k for k in old_tokens if old_tokens[k] != new_tokens.get(k)]
        print(f"token diffs vs committed: {len(diff)}")
        for k in diff[:10]:
            print(f"  {k!r}: {old_tokens[k]} -> {new_tokens.get(k)}")
        old_exact = {(r["modality"], r["text"], r["span_start"]):
                     (r["y_pred"], r["status"]) for r in json.load(open(EXACT_OUT))}
        new_exact = {(r["modality"], r["text"], r["span_start"]):
                     (r["y_pred"], r["status"]) for r in exact}
        ediff = [k for k in old_exact if old_exact[k] != new_exact.get(k)]
        print(f"exact diffs vs committed: {len(ediff)}")
        for k in ediff[:10]:
            print(f"  {k[0]}:{k[2]} {old_exact[k]} -> {new_exact.get(k)}")
        sys.exit(0 if not diff and not ediff else 1)

    with open(TOKENS_OUT, "w") as f:
        json.dump(tokens, f, ensure_ascii=False)
    with open(EXACT_OUT, "w") as f:
        json.dump(exact, f, ensure_ascii=False)
    print(f"wrote {TOKENS_OUT} and {EXACT_OUT}")


if __name__ == "__main__":
    main()
