"""Round-12 probe D: 10x scale shapes for the round's four
pre-staged operators (the per-operator probe discipline):

  * phash_df / phash_neardup_pairs — hashing is a shuffle-free
    per-row projection (expect linear in rows, flat per row); pairs
    ride the simhash slice machinery (distinct-sketch-bounded).
  * mmr_rerank POST-POOL stages — with the candidate pool held at
    the same size, the greedy rounds must be corpus-size-FREE (the
    pool stage itself is whichever ANN operator the caller picks;
    exact cosine_topk is the documented small-N baseline).
  * dedup_weighted_sample — inherits CC clustering (probed r5/r7)
    + priority sampling (probed r11); measured end-to-end here.
  * stream_ivf_append — inherits the r12 bloom-sidecar append
    probes; measured end-to-end at 10x streamed corpus.

Run: python scripts/scale_probe_r12d.py   (quiet host)
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from formula1_data_pipeline_spark import get_spark  # noqa: E402

SF1 = "/root/testdata/sf0.001"   # 500 docs / 500 vecs
SF10 = "/root/testdata/sf0.01"   # same row counts, denser text
# documents/embeddings are fixed-size across sf; blow up via unions
N_BLOWUP = 10


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def blowup_docs(spark, n):
    d = spark.read.parquet(f"{SF1}/documents.parquet") \
        .select("doc_id", "text")
    out = d
    for i in range(1, n):
        out = out.unionByName(
            d.select((F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                     F.concat(F.lit(f"v{i} "), F.col("text"))
                     .alias("text")))
    return out


def blowup_emb(spark, n):
    e = spark.read.parquet(f"{SF1}/embeddings.parquet") \
        .select("vec_id", "embedding")
    out = e
    for i in range(1, n):
        out = out.unionByName(
            e.select((F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                     F.transform("embedding",
                                 lambda x: x + F.lit(float(i)) / 1e3)
                     .alias("embedding")))
    return out


def main():
    from formula1_data_pipeline_spark.operators import phash as P
    from formula1_data_pipeline_spark.operators.mmr import mmr_rerank
    from formula1_data_pipeline_spark.operators.multimodal import (
        to_media_table,
    )
    from formula1_data_pipeline_spark.operators.sampling import (
        dedup_weighted_sample,
    )
    from formula1_data_pipeline_spark.operators.similarity import (
        cosine_topk,
    )
    from formula1_data_pipeline_spark.operators.vecindex import (
        ivf_index_build,
    )
    from formula1_data_pipeline_spark.streaming.ivf import (
        stream_ivf_append,
    )

    spark = get_spark()
    d1, d10 = blowup_docs(spark, 1), blowup_docs(spark, N_BLOWUP)
    e1, e10 = blowup_emb(spark, 1), blowup_emb(spark, N_BLOWUP)
    for df in (d1, d10, e1, e10):
        df.persist().count()

    # phash: hashing + pairs
    for tag, d in (("1x", d1), ("10x", d10)):
        m = to_media_table(d)
        t_hash = _t(lambda: P.phash_df(m, "ahash")
                    .groupBy().count().collect())
        t_pair = _t(lambda: P.phash_neardup_pairs(m, "ahash",
                                                  max_distance=8)
                    .groupBy().count().collect())
        print(f"phash  @{tag}: hash {t_hash}s  pairs {t_pair}s",
              flush=True)

    # mmr post-pool: same queries, same pool size, 1x vs 10x corpus
    for tag, e in (("1x", e1), ("10x", e10)):
        q = e1.filter(F.col("vec_id") < 10)
        cand = cosine_topk(e, q, k=20, dim=64) \
            .select("q_id", "n_id", "cos_sim").persist()
        cand.count()
        t_pool = _t(lambda: cand.groupBy().count().collect())
        t_mmr = _t(lambda: mmr_rerank(e, q, k=5, pool=20,
                                      cand=cand)
                   .groupBy().count().collect())
        print(f"mmr    @{tag}: post-pool {t_mmr}s "
              f"(pool stage excluded)", flush=True)
        cand.unpersist()

    # dedup-weighted sampling end to end
    for tag, d in (("1x", d1), ("10x", d10)):
        t = _t(lambda: dedup_weighted_sample(d, 100)
               .groupBy().count().collect())
        print(f"dwsamp @{tag}: {t}s", flush=True)

    # streaming ivf append end to end (index built over head half)
    for tag, e in (("1x", e1), ("10x", e10)):
        root = tempfile.mkdtemp(prefix=f"probe_sivf_{tag}_")
        idx = f"{root}/idx"
        mx = e.agg(F.max("vec_id")).collect()[0][0]
        ivf_index_build(spark, e.filter(F.col("vec_id") <= mx // 2),
                        idx, n_centroids=16, n_iter=2)
        p = f"{root}/tail.parquet"
        e.filter(F.col("vec_id") > mx // 2).write.parquet(p)
        t = _t(lambda: stream_ivf_append(spark, p, idx,
                                         n_source_files=3))
        print(f"sivf   @{tag}: {t}s", flush=True)


if __name__ == "__main__":
    main()
