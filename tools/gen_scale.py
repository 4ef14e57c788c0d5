#!/usr/bin/env python3
"""Synthetic scale-up generator for the SCALING_r07 curve.

Replicates sf0.1's documents/embeddings K x with id remapping so the
corpus grows K x while the structural invariants the scale arguments
rest on stay fixed:

- documents: replica k > 0 suffixes every whitespace token with "~k",
  so each replica's shingle/bigram vocabulary is DISJOINT from every
  other's. Near-dup/similarity structure is preserved within a replica
  (clone pairs of the originals) and no cross-replica pair ever
  qualifies -- the honest scale-up for dedup operators, where replicating
  text verbatim would grow the TRUE pair count quadratically and no plan
  could (or should) look linear against that. lang/source keep their
  original values: dimension cardinality is scale-free by design.
- embeddings: vectors copy verbatim; vec_id and label shift per replica
  (label + k * (max_label + 1)), so per-label block sizes -- the q31/q183
  blocking knob -- stay constant while the corpus grows.

Determinism: pure remapping of the driver-generated sf0.1 fixture; no
randomness anywhere.

--sqrt-labels (round-10, VERDICT r9 item 2): the default label shift
grows the label space K x with the corpus -- which grows the IVF coarse
quantizer (one centroid per label) LINEARLY, where a real IVF retune
grows nlist ~ sqrt(n) (cell count and cell size both ~ sqrt(n)). Under
this flag replica rep reuses label block rep % round(sqrt(k)), so the
label space grows ~ sqrt(k) and per-label blocks grow ~ sqrt(k) -- the
honest scale geometry for the q250 curve. Duplicate vectors sharing a
label only shift that label's mean centroid deterministically; nothing
else changes. With a linearDir argument, documents.parquet and the
relational tables are symlinked from that already-generated linear
replica instead of recomputed (they are identical by construction).

Usage: python3 tools/gen_scale.py <k> <outDir> [--sqrt-labels [linearDir]]
       # e.g. 10 scaledata/sf1
       #      10 scaledata/sf1s --sqrt-labels scaledata/sf1
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def scale_documents(k: int, out: str) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    off = max(doc_id) + 1
    ids, txts, langs, srcs, ncs = [], [], [], [], []
    for rep in range(k):
        if rep == 0:
            rtxts = text
        else:
            suf = f"~{rep}"
            rtxts = [" ".join(w + suf for w in s.split()) for s in text]
        ids.extend(i + rep * off for i in doc_id)
        txts.extend(rtxts)
        langs.extend(lang)
        srcs.extend(source)
        ncs.extend(len(s) for s in rtxts)
    out_t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(txts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array(ncs, pa.int64()),
    })
    pq.write_table(out_t, f"{out}/documents.parquet")
    print(f"documents: {len(ids)} rows")


def scale_embeddings(k: int, out: str, sqrt_labels: bool = False) -> None:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t.column("vec_id").to_pylist()
    emb = t.column("embedding")
    label = t.column("label").to_pylist()
    v_off = max(vec_id) + 1
    l_off = max(label) + 1
    # sqrt mode: label blocks cycle over round(sqrt(k)) shifts -> label
    # count grows ~sqrt(k), per-label block size grows ~sqrt(k)
    m = max(1, round(k ** 0.5)) if sqrt_labels else k
    ids, labels = [], []
    chunks = []
    for rep in range(k):
        ids.extend(i + rep * v_off for i in vec_id)
        labels.extend(l + (rep % m) * l_off for l in label)
        chunks.append(emb)
    out_t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.concat_arrays([c.combine_chunks() for c in chunks]),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(out_t, f"{out}/embeddings.parquet")
    print(f"embeddings: {len(ids)} rows")


def main() -> None:
    k, out = int(sys.argv[1]), sys.argv[2]
    sqrt_labels = "--sqrt-labels" in sys.argv[3:]
    rest = [a for a in sys.argv[3:] if not a.startswith("--")]
    linear_dir = rest[0] if rest else None
    import os
    os.makedirs(out, exist_ok=True)
    if linear_dir:
        dst = f"{out}/documents.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f"{linear_dir}/documents.parquet"), dst)
        print("documents: linked")
    else:
        scale_documents(k, out)
    scale_embeddings(k, out, sqrt_labels)
    # the relational tables are not part of the scale-curve target set
    # (the top-cost queries are all in the document/embedding families);
    # symlink them so Verify/Bench table resolution still finds them.
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events"]:
        dst = f"{out}/{tbl}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{tbl}.parquet", dst)


if __name__ == "__main__":
    main()
