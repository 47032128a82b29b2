"""Full folder-in → artifacts-out runs (the reference notebook flows)."""

from __future__ import annotations

import os
from datetime import date

from etl_jetro_spark.pipelines.runner import run_247, run_acme


def test_run_247_end_to_end(spark, tmp_path):
    import pandas as pd

    drop = tmp_path / "drop"
    out = tmp_path / "out"
    drop.mkdir()
    pd.DataFrame(
        [
            ["junk", "", "", "", ""],
            ["Item#", "Item Description", "114", "86", "Total"],
            ["12345", "w", "3", "2", "5"],
            ["TOTALS", "", "3", "2", "5"],
        ]
    ).to_csv(drop / "allocation 0813.csv", index=False, header=False)
    pd.DataFrame(
        [
            ["junk", "", "", ""],
            ["Item#", "Item Name", "114", "490"],
            ["12345", "w", "2.50", "3.00"],
        ]
    ).to_csv(drop / "price 0813.csv", index=False, header=False)

    manifest = run_247(spark, str(drop), str(out), date(2026, 8, 13), initials="AB")
    assert manifest["order_sheet"]["rows"] == 2
    assert os.path.exists(manifest["order_sheet"]["parquet"])
    adpo = open(manifest["adpo_x"]).read()
    assert 'type "adpo,x"' in adpo and "-0990033" in adpo
    assert "Type  114-0012345" in adpo
    dlpm = open(manifest["dlpm"]).read()
    # store 490 remapped to 498 in the price path
    assert "Type 498-0012345" in dlpm and "Type 2.50" in dlpm

    back = spark.read.parquet(manifest["order_sheet"]["parquet"])
    got = {(r["Branch"], r["Item"]): r["Distro Size"] for r in back.collect()}
    assert got == {(114, 12345): 3, (186, 12345): 2}


def test_run_acme_end_to_end(spark, tmp_path):
    import pandas as pd

    drop = tmp_path / "drop"
    out = tmp_path / "out"
    drop.mkdir()
    pd.DataFrame(
        [
            ["x", "y", "dock", "Branch", "Item", "Description", "Distro Size"],
            ["a", "b", "189", "86", "1001", "d", "5"],
            ["a", "b", "407", "88", "1002", "d", "5"],
        ]
    ).to_csv(drop / "acme il 0813.csv", index=False, header=False)
    manifest = run_acme(spark, str(drop), str(out), date(2026, 8, 13))
    back = spark.read.parquet(manifest["order_sheet"]["parquet"])
    rows = back.collect()
    assert len(rows) == 1 and rows[0]["Branch"] == 186  # fl dock filtered out
