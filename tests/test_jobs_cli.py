"""CLI job layer driven through main() with real dirs (ingest → process
→ analytics → compact)."""

from __future__ import annotations

import json

from bike_data_flow_spark.jobs import main

from tests.conftest import GOOD_ROWS, HEADER


def test_cli_pipeline_end_to_end(spark, tmp_path, capsys):
    src = tmp_path / "snapshot.txt"
    src.write_text(HEADER + "\n" + "\n".join(GOOD_ROWS) + "\n")

    rc = main(
        [
            "ingest",
            "--landing", str(tmp_path / "raw"),
            "--source", str(src),
            "--polls", "2",
            "--interval", "0",
        ]
    )
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "landed_files": 1  # second poll is an identical payload → gated
    }

    rc = main(
        [
            "process",
            "--landing", str(tmp_path / "raw"),
            "--enhanced", str(tmp_path / "enhanced"),
            "--checkpoint", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0

    rc = main(
        [
            "analytics",
            "--enhanced", str(tmp_path / "enhanced"),
            "--map-out", str(tmp_path / "density.html"),
            "--cells", "16",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total_records"] == 3
    assert out["record_type_distribution"] == {"station": 2, "bike": 1}
    assert (tmp_path / "density.html").exists()

    rc = main(["compact", "--zone", str(tmp_path / "enhanced")])
    assert rc == 0


def test_cli_curate_dedups_documents(spark, tmp_path, capsys):
    import json

    from bike_data_flow_spark.jobs import main

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = (
        # 0 and 1: exact duplicates (one keeper)
        [(0, base), (1, base)]
        # 2: near-dup of base (one word changed -> LSH pair with 0)
        + [(2, base.replace("lazy", "sleepy"))]
        # 3: distinct quality doc
        + [(3, "completely different text with enough tokens to pass the gate fine")]
        # 4: fails the quality gate (too short)
        + [(4, "too short")]
    )
    src = tmp_path / "docs.parquet"
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(str(src))

    out_dir = tmp_path / "keepers"
    rc = main(["curate", "--documents", str(src), "--out", str(out_dir)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["input_docs"] == 5
    assert report["quality_pass"] == 4  # doc 4 gated out
    kept = {r["doc_id"] for r in spark.read.parquet(str(out_dir)).collect()}
    # 1 is an exact dup of 0; 2 clusters with 0 via LSH; 3 survives
    assert kept == {0, 3}
