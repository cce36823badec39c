"""spark-submit job entry tests (fineweb_domain_analyzer_spark.job)."""

from __future__ import annotations

import json

from fineweb_domain_analyzer_spark import job


def test_job_synth_splits_are_disjoint(spark, tmp_path, capsys, monkeypatch):
    """--splits under --synth-rows must bucket the corpus, not write one
    full copy per split (regression: synth mode ignored the split key)."""
    # job.main builds its own session via get_spark(); reuse the test
    # session's master to avoid a second JVM
    out = tmp_path / "out"
    manifest = tmp_path / "m.json"
    rc = job.main(
        [
            "--synth-rows",
            "20000",
            "--splits",
            "0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15",
            "--output",
            str(out),
            "--manifest",
            str(manifest),
            "--master",
            "local[4]",
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # all 16 url-hash buckets together must partition the corpus exactly
    assert report["total"] == 20000
    assert report["kept"] + report["excluded"] == 20000
    assert len(report["splits_processed"]) == 16
    assert set(json.load(open(manifest))["splits"]) == {str(i) for i in range(16)}


def test_job_resume_skips_committed_splits(spark, tmp_path, capsys):
    out = tmp_path / "out"
    manifest = tmp_path / "m.json"
    common = [
        "--synth-rows", "5000",
        "--splits", "0,1",
        "--output", str(out),
        "--manifest", str(manifest),
        "--master", "local[4]",
    ]
    assert job.main(common) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(first["splits_processed"]) == 2
    # second invocation: everything committed, nothing reprocessed,
    # read-back metrics unchanged
    assert job.main(common) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["splits_processed"] == []
    assert second["total"] == first["total"]
