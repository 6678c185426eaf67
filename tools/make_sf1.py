"""Generate the sf1 heavy-bench corpus (VERDICT r3 items 3+7).

The driver's testdata stops at sf0.1 (5,000 documents / 2,000 embeddings) —
walls of ~4s there sit inside Spark's scheduling-overhead regime, which is
exactly why `d_dup_components`'s c32-vs-c8 question has stayed unsettled for
three rounds. This builds a 10x corpus (50,000 documents / 20,000
embeddings) in the SAME shape as the driver tables: the sf0.1 vocabulary
(31 tokens, read deterministically from the read-only driver file), ~66
tokens/doc, the observed lang/source mix, doc_id-contiguous ids — plus a
planted duplicate structure (2% exact re-crawls, 5% near-dup mutations of
an earlier doc) so the dedup operators do real work. Pure function of the
seed: every byte is reproducible, nothing external.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/pes_sf1)
Cached: regeneration is skipped when the output marker exists.
"""

from __future__ import annotations

import os
import random
import sys

SEED = 42
N_DOCS = 50_000
N_EMB = 20_000
EMB_DIM = 64
N_LABELS = 10
N_FILES = 8
DEFAULT_OUT = "/tmp/pes_sf1"
_SRC = "/root/testdata/sf0.1/documents.parquet"

_LANGS = ["en", "zh", "es", "fr", "de"]
_LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]


def _vocab() -> list[str]:
    """The sf0.1 corpus vocabulary, sorted — deterministic, read-only."""
    import duckdb

    rows = duckdb.sql(
        "select distinct unnest(regexp_split_to_array(trim(regexp_replace("
        f"lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) t from read_parquet('{_SRC}') "
        "order by 1"
    ).fetchall()
    return [r[0] for r in rows if r[0]]


def build(out_dir: str = DEFAULT_OUT) -> str:
    marker = os.path.join(out_dir, "_SF1_OK")
    if os.path.exists(marker):
        return out_dir
    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab = _vocab()
    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    # --- documents ---
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    for doc_id in range(N_DOCS):
        rng = random.Random(SEED * 10_000_019 + doc_id)
        roll = rng.random()
        if doc_id >= 100 and roll < 0.02:
            text = texts[rng.randrange(doc_id)]  # exact re-crawl
        elif doc_id >= 100 and roll < 0.07:
            toks = texts[rng.randrange(doc_id)].split(" ")  # near-dup mutation
            for _ in range(3):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            text = " ".join(toks)
        else:
            n = max(8, int(rng.gauss(66, 18)))
            text = " ".join(rng.choice(vocab) for _ in range(n))
        texts.append(text)
        langs.append(rng.choices(_LANGS, weights=_LANG_W, k=1)[0])
        sources.append(f"src{rng.randrange(20)}")
    per = (N_DOCS + N_FILES - 1) // N_FILES
    for f in range(N_FILES):
        lo, hi = f * per, min((f + 1) * per, N_DOCS)
        table = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), type=pa.int64()),
                "text": texts[lo:hi],
                "lang": langs[lo:hi],
                "source": sources[lo:hi],
                "n_chars": pa.array(
                    [len(t) for t in texts[lo:hi]], type=pa.int64()
                ),
            }
        )
        pq.write_table(table, os.path.join(tmp, f"documents-{f:02d}.parquet"))
    # queries read '{sf}/documents.parquet'; a directory of that NAME holding
    # the part files keeps the many-split scan AND the read API unchanged
    os.makedirs(os.path.join(tmp, "documents.parquet"), exist_ok=True)
    for f in range(N_FILES):
        os.replace(
            os.path.join(tmp, f"documents-{f:02d}.parquet"),
            os.path.join(tmp, "documents.parquet", f"part-{f:02d}.parquet"),
        )

    # --- embeddings: label-centered gaussian clusters, float32 ---
    centers: list[list[float]] = []
    for lab in range(N_LABELS):
        crng = random.Random(SEED * 7_000_003 + lab)
        centers.append([crng.uniform(-1.0, 1.0) for _ in range(EMB_DIM)])
    vec_ids, embs, labels = [], [], []
    for vec_id in range(N_EMB):
        rng = random.Random(SEED * 11_000_027 + vec_id)
        lab = vec_id % N_LABELS
        embs.append(
            [float(c + rng.gauss(0.0, 0.3)) for c in centers[lab]]
        )
        vec_ids.append(vec_id)
        labels.append(lab)
    os.makedirs(os.path.join(tmp, "embeddings.parquet"), exist_ok=True)
    perv = (N_EMB + N_FILES - 1) // N_FILES
    for f in range(N_FILES):
        lo, hi = f * perv, min((f + 1) * perv, N_EMB)
        table = pa.table(
            {
                "vec_id": pa.array(vec_ids[lo:hi], type=pa.int64()),
                "embedding": pa.array(
                    embs[lo:hi], type=pa.list_(pa.float32())
                ),
                "label": pa.array(labels[lo:hi], type=pa.int32()),
            }
        )
        pq.write_table(
            table, os.path.join(tmp, "embeddings.parquet", f"part-{f:02d}.parquet")
        )
    with open(os.path.join(tmp, "_SF1_OK"), "w") as fh:
        fh.write("ok\n")
    if os.path.exists(out_dir):
        import shutil

        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT)
    print(out)
