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


def test_spark_submit_py_files_packaging(tmp_path):
    """North-rule packaging clause, end to end: zip the package, launch
    it through REAL ``spark-submit --py-files`` in a subprocess whose
    environment cannot import the repo (PYTHONPATH cleared, cwd outside
    the repo) — so every import, driver AND Python-UDF worker side, must
    resolve from the zip. Asserts the job completes and prints its
    read-back metrics report."""
    import os
    import subprocess
    import sys
    import zipfile
    from pathlib import Path

    import pyspark

    repo = Path(__file__).resolve().parent.parent
    pkg = repo / "fineweb_domain_analyzer_spark"
    zip_path = tmp_path / "fineweb_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(pkg.rglob("*")):
            if "__pycache__" in f.parts or not f.is_file():
                continue
            zf.write(f, f.relative_to(repo))

    launcher = tmp_path / "launch_job.py"
    launcher.write_text(
        "import sys\n"
        "from fineweb_domain_analyzer_spark.job import main\n"
        "sys.exit(main(sys.argv[1:]))\n",
        encoding="utf-8",
    )

    spark_submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out_dir = tmp_path / "out"
    res = subprocess.run(
        [
            str(spark_submit),
            "--master",
            "local[4]",
            "--py-files",
            str(zip_path),
            str(launcher),
            "--synth-rows",
            "4000",
            "--splits",
            "0,1",
            "--output",
            str(out_dir),
            "--manifest",
            str(tmp_path / "manifest.json"),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    report = json.loads(
        [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert sorted(report["splits_processed"]) == ["0", "1"]
    assert report["total"] == report["kept"] + report["excluded"] > 0
    assert report["lineage_partitions"] > 0


class TestDataCardNullGroups:
    def test_null_lang_not_double_counted(self, spark):
        """cube rollup rows are selected by grouping_id, so a real NULL
        langid group must not double into the decision/overall sums."""
        from fineweb_domain_analyzer_spark.operators.metrics import data_card

        rows = [
            ("kept", "en", 10),
            ("kept", None, 7),       # real NULL language group
            ("quality_filtered", None, 3),
            ("robots_disallowed", "de", 5),
        ]
        df = spark.createDataFrame(
            rows, "drop_reason string, langid string, word_count int"
        )
        card = {
            (r["section"], r["key"]): (r["docs"], r["words"])
            for r in data_card(df).collect()
        }
        assert card[("overall", "all")] == (4, 25)
        assert card[("decision", "kept")] == (2, 17)
        assert card[("decision", "dropped")] == (2, 8)
        assert card[("drop_reason", "kept")] == (2, 17)
        assert card[("drop_reason", "quality_filtered")] == (1, 3)
        # the kept NULL-lang group appears once, as its own key
        assert card[("language_kept", "en")] == (1, 10)
        assert card[("language_kept", None)] == (1, 7)
