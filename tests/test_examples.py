"""Smoke tests for the example apps (VERDICT r3 item 6): the showcase
entrypoints are the only Python pytest never imported — keep them from
rotting by actually running the corpus pipeline end-to-end at sf0.001."""

from __future__ import annotations

import shutil
import tempfile


def test_corpus_prep_app_end_to_end(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from corpus_prep_app import run

    out = tempfile.mkdtemp(prefix="corpus_smoke_")
    try:
        cap_k = 10
        run(spark, sf_dir, out, cap_k=cap_k, show=False)

        corpus = spark.read.parquet(f"{out}/corpus")
        profile = spark.read.parquet(f"{out}/profile")
        rows = profile.collect()
        assert len(rows) > 0
        assert corpus.count() > 0
        # the profile is the corpus's own aggregate
        assert sum(r.n_docs for r in rows) == corpus.count()
        assert {r.split for r in rows} <= {"train", "val", "test"}
        # the per-domain quota cap held: ≤ cap_k docs per source overall
        per_source: dict[str, int] = {}
        for r in rows:
            per_source[r.source] = per_source.get(r.source, 0) + r.n_docs
        assert all(n <= cap_k for n in per_source.values()), per_source
        # rerun determinism: every decision is content/id-derived, so a
        # second run reproduces the corpus row-for-row
        out2 = tempfile.mkdtemp(prefix="corpus_smoke2_")
        try:
            run(spark, sf_dir, out2, cap_k=cap_k, show=False)
            again = spark.read.parquet(f"{out2}/corpus")
            assert corpus.exceptAll(again).count() == 0
            assert again.exceptAll(corpus).count() == 0
        finally:
            shutil.rmtree(out2, ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
