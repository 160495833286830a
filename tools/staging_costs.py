"""Measure the BUILD cost (seconds, on-disk bytes) of every staged
per-corpus index artifact, per scale factor.

The bench medians measure warm serve; the staged tier's claim is that
each artifact build is corpus-linear offline work. This tool measures
that claim instead of asserting it: run it at two SFs and compare the
growth (PLANS.md carries the resulting rows per round).

Staging dirs are process-lifetime tempdirs, so a fresh run of this
script always pays every build exactly once. Builders that depend on
other staged artifacts (minhash sig on shingles, simhash fp on the tf
index, DSIR/CCNet on tokenized docs) are measured AFTER their
dependency, so each row is that artifact's own incremental build cost.

Usage:
    python tools/staging_costs.py [sf_dir ...]
defaults to sf0.01 and sf0.1. Prints one aligned table plus a JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    from mapreduce_simulation_spark import staging
    from mapreduce_simulation_spark.operators import (
        curation,
        dedup,
        retrieval,
        similarity,
        text,
    )
    from mapreduce_simulation_spark.session import build_session
    from mapreduce_simulation_spark.tables import load_table

    spark = build_session("staging-costs")

    def ivf_fixed(spark, sf_dir):
        corpus = similarity._corpus_with_norm(spark, sf_dir)
        cents = corpus.where(
            (corpus.vec_id >= similarity.N_QUERIES)
            & (corpus.vec_id < similarity.N_QUERIES + similarity.N_CENTROIDS)
        ).select(
            corpus.vec_id.alias("cid"),
            corpus.v.alias("cv"),
            corpus.nrm.alias("cn"),
        )
        similarity._staged_ivf_assign(spark, sf_dir, corpus, cents)

    def ivf_trained(spark, sf_dir):
        corpus = similarity._corpus_with_norm(spark, sf_dir)
        cents = similarity._staged_trained_centroids(spark, sf_dir)
        similarity._staged_ivf_assign(
            spark,
            sf_dir,
            corpus,
            cents,
            variant=similarity.TRAINED_ASSIGN_VARIANT,
        )

    def _gate_verdicts(spark, sf_dir):
        from mapreduce_simulation_spark.streaming.stateful import (
            _staged_gate_verdicts,
        )

        _staged_gate_verdicts(spark, sf_dir).count()

    def _logreg_weights(spark, sf_dir):
        from mapreduce_simulation_spark.operators import mltrain

        mltrain._staged_logreg_weights(spark, sf_dir)

    def _kmeans_centroids(spark, sf_dir):
        from mapreduce_simulation_spark.operators import mltrain

        mltrain._staged_kmeans_centroids(spark, sf_dir)

    # (label, prefix, build) — dependency order: tokdocs first, then the
    # artifacts derived from it, then the embedding-side artifacts.
    builders = [
        ("tokenized_docs", "tokdocs_",
         lambda s, d: text.staged_tokenized_docs(s, d).count()),
        ("bm25_tf_index", "bm25_tf_",
         lambda s, d: (retrieval._staged_tf_index(s, d).count(),
                       retrieval._staged_dl(s, d).count())),
        ("shingles", "shingles_",
         lambda s, d: dedup.staged_shingles(s, d).count()),
        ("near_dup_pairs", "neardup_pairs_",
         lambda s, d: dedup.staged_near_dup_pairs(
             s, d, load_table(s, d, "documents")).count()),
        ("minhash_signatures", "minhash_sig_",
         lambda s, d: dedup._staged_minhash_sig(s, d).count()),
        ("simhash_fingerprints", "simhash_fp_",
         lambda s, d: dedup._staged_simhash_fp(s, d).count()),
        ("ccnet_lm", "ccnet_lm_",
         lambda s, d: curation._staged_ccnet_lm(s, d)[0].count()),
        ("dsir_weights", "dsir_w_",
         lambda s, d: curation._staged_dsir_weights(s, d).count()),
        ("lsh_band_signatures", "lsh_sigs_",
         lambda s, d: similarity._staged_band_signatures(
             s, d, similarity._corpus_with_norm(s, d)).count()),
        # r16: the multi-table serve index (8 tables × 8 planes)
        ("lsh_multitable_signatures", "lsh_mt_sigs_",
         lambda s, d: similarity._staged_multitable_signatures(
             s, d, similarity._corpus_with_norm(s, d)).count()),
        # r17: the re-planed WIDE index (8 tables × 16 planes) — built
        # by lsh_index_replane when the census trigger fires; same
        # prefix, own keyed dir, so this row is its incremental build
        ("lsh_multitable_signatures_wide", "lsh_mt_sigs_",
         lambda s, d: similarity._staged_multitable_signatures(
             s, d, similarity._corpus_with_norm(s, d),
             n_planes=similarity.N_HYPERPLANES_WIDE).count()),
        ("ivf_fixed_assign", "ivf_idx_", ivf_fixed),
        ("ivf_trained_codebook+assign", "ivf_cb_", ivf_trained),
        ("pq_codebooks+codes", "pq_idx_",
         lambda s, d: similarity._staged_pq_index(s, d)[1].count()),
        # r10: ingestion-gate verdicts (drains the streaming gate once;
        # includes the gate's own single-file corpus staging)
        ("gate_verdicts", "gate_verdicts_", _gate_verdicts),
        # r10: trained-model artifacts (fit once per corpus, serve after)
        ("logreg_weights", "logreg_w_", _logreg_weights),
        ("kmeans_centroids", "kmeans_c_", _kmeans_centroids),
    ]

    # Warm the session (JVM codegen, parquet reader init) so the first
    # measured build doesn't absorb one-time startup.
    load_table(spark, sf_dirs[0], "documents").count()

    rows = []
    for sf_dir in sf_dirs:
        sf = os.path.basename(sf_dir.rstrip("/"))
        for label, prefix, build in builders:
            before = {
                k: v for k, v in staging._KEYED.items() if k[0] == prefix
            }
            t0 = time.perf_counter()
            build(spark, sf_dir)
            secs = round(time.perf_counter() - t0, 2)
            new_dirs = [
                v
                for k, v in staging._KEYED.items()
                if k[0].startswith(prefix) and k not in before
                and sf_dir in k[1]
            ]
            # ivf_trained also creates an ivf_idx_ dir; count every dir
            # this builder newly registered for this sf.
            if label == "ivf_trained_codebook+assign":
                new_dirs += [
                    v
                    for k, v in staging._KEYED.items()
                    if k[0] == "ivf_idx_" and "trained" in k[1]
                    and sf_dir in k[1]
                ]
            size = sum(_dir_bytes(p) for p in new_dirs)
            rows.append(
                {"sf": sf, "artifact": label, "build_sec": secs,
                 "bytes": size}
            )
            print(
                f"{sf:8s} {label:28s} {secs:8.2f}s "
                f"{size / 1024:10.1f} KiB"
            )

    print(json.dumps({"staging_build_costs": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
