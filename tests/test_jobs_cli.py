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
