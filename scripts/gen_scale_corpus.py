#!/usr/bin/env python3
"""Generate a seeded sfN-equivalent corpus for LOCAL scale rehearsal.

The driver ships sf0.001/0.01/0.1 only; every 100 TB claim in this repo
otherwise rests on plan-shape argument. This script extrapolates the
harness distribution to larger scale factors so the multi-stage queries
can be measured at 10x (SCALE.md records the results):

  documents:  rows = 50000 * sf   (sf0.1 has 5000)
    - same 31-token vocabulary as the harness tables (read from the
      sf0.1 parquet, so the token set can never drift)
    - text length uniform ~100-500 chars (harness avg 297)
    - same 5-language split (en ~41%, es/fr/de/zh ~15% each)
    - source uniform src0..src19
    - ~0.16% of docs are exact copies of an earlier doc (harness sf0.1:
      8 copies / 5000) and ~0.2% are 1-token edits (near-dups), keeping
      the dedup work per-capita comparable
  embeddings: rows = 20000 * sf   (sf0.1 has 2000)
    - 64-dim unit-norm float32 gaussian vectors, label uniform 0..9

Usage: gen_scale_corpus.py <sf> <outDir> [--vocab=harness|heaps]
Deterministic for a given (sf, seed, vocab mode).

Vocab modes:
  harness (default) — the harness tables' fixed 31-token vocabulary.
    This is the ADVERSARIAL corpus for exact near-dup paths: df per
    shingle grows with n, so the exact pair join's output grows ~n².
  heaps — tokens drawn Zipf(s=1.1) from a 200k-word universe. Sampling
    a fixed Zipf yields the two properties real web text has (and the
    harness mode deliberately lacks): observed vocabulary grows
    sublinearly with corpus size (Heaps' law emerges from Zipf
    sampling) and document frequency concentrates in a head the
    df-cap / stop-gram machinery excludes — so this mode bounds the
    exact paths from the FAVORABLE side, telling a curator when the
    exact form is actually fine. Same length / language / dup-rate
    distribution as harness mode, so per-doc work stays comparable.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

SEED = 20260814
ZIPF_S = 1.1
ZIPF_UNIVERSE = 200000


def main():
    sf = float(sys.argv[1])
    out = sys.argv[2]
    mode = "harness"
    for a in sys.argv[3:]:
        if a.startswith("--vocab="):
            mode = a.split("=", 1)[1]
    assert mode in ("harness", "heaps"), mode
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    if mode == "harness":
        vocab = [r[0] for r in duckdb.sql(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS t "
            "FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY t").fetchall()]
        assert len(vocab) == 31, len(vocab)
        cum = None
    else:
        # synthetic word universe w0..wN with harness-like word lengths
        # (base-26 suffix keeps lengths 4-8 chars); Zipf(s) inverse-CDF
        # sampling via one searchsorted per token
        def word(j):
            s, x = "", j
            while True:
                s += chr(ord('a') + x % 26)
                x //= 26
                if x == 0:
                    break
            return "w" + s
        vocab = [word(j) for j in range(ZIPF_UNIVERSE)]
        p = 1.0 / np.power(np.arange(1, ZIPF_UNIVERSE + 1, dtype=np.float64), ZIPF_S)
        cum = np.cumsum(p / p.sum())

    n_docs = int(50000 * sf)
    langs = np.array(["en", "es", "fr", "de", "zh"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])

    texts = []
    for i in range(n_docs):
        target = rng.integers(100, 501)
        toks = []
        ln = -1
        while ln < target:
            if cum is None:
                w = vocab[rng.integers(0, len(vocab))]
            else:
                w = vocab[int(np.searchsorted(cum, rng.random()))]
            toks.append(w)
            ln += len(w) + 1
        texts.append(" ".join(toks))
    # exact copies (~0.16%) and 1-token edits (~0.2%) of earlier docs
    n_copy = int(round(n_docs * 0.0016))
    n_edit = int(round(n_docs * 0.002))
    for _ in range(n_copy):
        dst = int(rng.integers(1, n_docs))
        src = int(rng.integers(0, dst))
        texts[dst] = texts[src]
    for _ in range(n_edit):
        dst = int(rng.integers(1, n_docs))
        src = int(rng.integers(0, dst))
        toks = texts[src].split(" ")
        toks[int(rng.integers(0, len(toks)))] = vocab[int(rng.integers(0, len(vocab)))]
        texts[dst] = " ".join(toks)

    docs = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(langs, n_docs, p=lang_p), pa.string()),
        "source": pa.array([f"src{int(i)}" for i in rng.integers(0, 20, n_docs)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(docs, f"{out}/documents.parquet")

    n_vecs = int(20000 * sf)
    v = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vecs), pa.int32()),
    })
    pq.write_table(emb, f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} docs, {n_vecs} vecs to {out}")


if __name__ == "__main__":
    main()
