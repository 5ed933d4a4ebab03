"""Migration flow: resolver semantics ported from the reference
(contessa/migration.py MigrationsResolver — fallback version, head
check, upgrade/downgrade command) and the real v1→v2 step over a
pipeline base_path (lineage gains ``input_fp``)."""

import json
import os

import pytest

from contessa_spark.migration import (
    MigrationsResolver,
    migrate,
)

MAP = {"0.1.0": 1, "0.2.0": 2, "0.4.0": 3}


@pytest.mark.parametrize(
    "pkg,expected",
    [
        ("0.1.0", "0.1.0"),  # exact hit
        ("0.3.0", "0.2.0"),  # between mapped versions → closest below
        ("0.0.1", "0.1.0"),  # below the first → clamp to first
        ("9.9.9", "0.4.0"),  # above the last → clamp to last
        ("0.2.5", "0.2.0"),
    ],
)
def test_resolver_fallback_version(tmp_path, pkg, expected):
    r = MigrationsResolver(MAP, pkg, str(tmp_path))
    assert r.get_fallback_version() == expected


def test_resolver_commands(tmp_path):
    base = str(tmp_path)
    r = MigrationsResolver(MAP, "0.2.0", base)
    # no marker: upgrade to head
    assert r.get_migration_to_head() == ("upgrade", 2)
    with open(os.path.join(base, "schema_version.json"), "w") as f:
        json.dump({"schema_version": 2}, f)
    assert r.is_on_head()
    assert r.get_migration_to_head() is None
    # marker above the package's head: downgrade
    with open(os.path.join(base, "schema_version.json"), "w") as f:
        json.dump({"schema_version": 3}, f)
    assert r.get_migration_to_head() == ("downgrade", 2)


def test_migrate_v1_base_end_to_end(spark, tmp_path):
    """A v1-shaped base (marker=1, lineage without input_fp) refuses to
    run, migrates in place, then resumes cleanly with the new column
    populated going forward."""
    from datetime import datetime

    from contessa_spark.pipeline import (
        PipelineConfig,
        QualityFilterPipeline,
        SCHEMA_VERSION,
    )
    from contessa_spark.results import LocalSmallTableMerge
    from contessa_spark.sources.webgen import generate

    src = str(tmp_path / "src")
    generate(spark, 300, seed=5).write.parquet(src)
    inp = spark.read.parquet(src)
    base = str(tmp_path / "base")
    ts = datetime(2025, 8, 1)

    pipe = QualityFilterPipeline(spark, base, PipelineConfig(n_buckets=4))
    pipe.run(inp, task_ts=ts)

    # forge the v1 layout: strip input_fp, stamp marker back to 1
    pdf = LocalSmallTableMerge.read(pipe.lineage_path)
    assert "input_fp" in pdf.columns and pdf["input_fp"].notna().all()
    LocalSmallTableMerge.merge(
        pdf.drop(columns=["input_fp"]), pipe.lineage_path, ["bucket"]
    )
    with open(os.path.join(base, "schema_version.json"), "w") as f:
        json.dump({"schema_version": 1}, f)

    with pytest.raises(ValueError, match="migrate"):
        pipe.run(inp, task_ts=ts)

    assert migrate(base) == SCHEMA_VERSION
    migrated = LocalSmallTableMerge.read(pipe.lineage_path)
    assert "input_fp" in migrated.columns
    assert migrated["input_fp"].isna().all()  # old rows: unknown input

    # resumes: every bucket already checkpointed
    s = pipe.run(inp, task_ts=ts)
    assert s["resumed_buckets_skipped"] == 4

    # migrate is idempotent on head
    assert migrate(base) == SCHEMA_VERSION


def test_migrate_downgrade_drops_column(spark, tmp_path):
    from datetime import datetime

    from contessa_spark.pipeline import PipelineConfig, QualityFilterPipeline
    from contessa_spark.results import LocalSmallTableMerge
    from contessa_spark.sources.webgen import generate

    base = str(tmp_path / "base")
    pipe = QualityFilterPipeline(spark, base, PipelineConfig(n_buckets=2))
    pipe.run(generate(spark, 200, seed=6), task_ts=datetime(2025, 8, 1))

    # downgrade to the v1 head of package 0.1.0
    assert migrate(base, package_version="0.1.0") == 1
    pdf = LocalSmallTableMerge.read(pipe.lineage_path)
    assert "input_fp" not in pdf.columns
    with open(os.path.join(base, "schema_version.json")) as f:
        assert json.load(f)["schema_version"] == 1


def test_corrupt_marker_raises_clearly(tmp_path):
    """A marker that exists but holds garbage must raise a diagnostic,
    not a downstream ``None < int`` TypeError (ADVICE r3)."""
    base = str(tmp_path)
    marker = os.path.join(base, "schema_version.json")
    r = MigrationsResolver(MAP, "0.2.0", base)

    with open(marker, "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt schema-version marker"):
        r.get_applied_migration()

    with open(marker, "w") as f:
        json.dump({"something_else": 1}, f)
    with pytest.raises(ValueError, match="not an integer"):
        r.get_migration_to_head()

    with open(marker, "w") as f:
        json.dump({"schema_version": "two"}, f)
    with pytest.raises(ValueError, match="not an integer"):
        r.is_on_head()


def test_pv_tolerates_nonnumeric_components(tmp_path):
    """``0.2.0rc1``-style versions must resolve (packaging.parse
    parity in spirit), not crash the fallback walk."""
    r = MigrationsResolver(MAP, "0.2.0rc1", str(tmp_path))
    assert r.get_fallback_version() == "0.2.0"
    r2 = MigrationsResolver(MAP, "0.3.0-dev", str(tmp_path))
    assert r2.get_fallback_version() == "0.2.0"
