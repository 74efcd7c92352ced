"""Lifecycle-stage routing (``ON ... STAGES``): hot/warm path selection at
plan time — the Spark-native analogue of the reference's stage → node-selector
routing (``banyand/dquery/dquery.go:161-192`` parseNodeSelector,
``common.proto:65-93`` LifecycleStage, ``measure/v1/query.proto:147-148``).

A stage owns a subset of the resource's paths; stage selection = path-set
selection, so the scan never opens files outside the chosen tiers (the
100 TB analogue: cold object-store data is untouched unless asked for)."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.bydbql.transformer import execute
from skywalking_banyandb_spark.catalog import (
    Catalog,
    FieldSpec,
    MeasureSchema,
    StageSpec,
    StreamSchema,
    TagSpec,
    resolve_stage_paths,
)
from skywalking_banyandb_spark.model import MeasureQuery, StreamQuery, TimeRange
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.plans.stream import compile_stream
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL

CUTOFF = dt.datetime(2024, 1, 16)


@pytest.fixture(scope="module")
def staged(spark):
    """events split into hot (ts >= Jan 16) and warm (ts < Jan 16) dirs."""
    d = tempfile.mkdtemp(prefix="stages_")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    hot, warm = os.path.join(d, "hot"), os.path.join(d, "warm")
    ev.where(F.col("ts") >= F.lit(CUTOFF)).write.parquet(hot)
    ev.where(F.col("ts") < F.lit(CUTOFF)).write.parquet(warm)
    cat = Catalog()
    tags = (TagSpec("user_id", "INT"), TagSpec("event_type", "STRING"))
    cat.register(
        MeasureSchema(
            group="g1", name="metrics", paths=(hot, warm), ts_column="ts",
            tags=tags, fields=(FieldSpec("value", "FLOAT"),),
            entity=("user_id",), version_column="event_id",
            stages=(StageSpec("hot", (hot,)), StageSpec("warm", (warm,))),
            default_stages=("hot",),
        )
    )
    cat.register(
        StreamSchema(
            group="g1", name="event_log", paths=(hot, warm), ts_column="ts",
            element_id_column="event_id",
            tags=(*tags, TagSpec("value", "FLOAT")),
            stages=(StageSpec("hot", (hot,)), StageSpec("warm", (warm,))),
            default_stages=("hot", "warm"),
        )
    )
    yield cat
    shutil.rmtree(d, ignore_errors=True)


TR = TimeRange.of("2024-01-01T00:00:00", "2024-02-01T00:00:00")


def _counts(spark):
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    from skywalking_banyandb_spark.operators.dedup import latest_version

    dd = latest_version(ev, ["user_id"], "ts", "event_id")
    hot = dd.where(F.col("ts") >= F.lit(CUTOFF)).count()
    warm = dd.where(F.col("ts") < F.lit(CUTOFF)).count()
    return hot, warm


def test_default_stages_apply(spark, staged):
    """No stages in the query -> the group's default_stages (hot only)."""
    hot, _ = _counts(spark)
    q = MeasureQuery(groups=["g1"], name="metrics", time_range=TR, limit=10**9)
    got = compile_measure(spark, staged, q)
    assert got.count() == hot
    assert got.agg(F.min("ts")).head()[0] >= CUTOFF


def test_explicit_stage_selects_tier(spark, staged):
    _, warm = _counts(spark)
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR, limit=10**9,
        stages=("WARM",),  # case-insensitive match (dquery.go EqualFold)
    )
    got = compile_measure(spark, staged, q)
    assert got.count() == warm
    assert got.agg(F.max("ts")).head()[0] < CUTOFF


def test_all_stages_and_unknown_fallback(spark, staged):
    hot, warm = _counts(spark)
    both = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR, limit=10**9,
        stages=("hot", "warm"),
    )
    assert compile_measure(spark, staged, both).count() == hot + warm
    # unknown stage names resolve to nothing -> unrestricted (dquery.go
    # returns no selector and the query fans out to all nodes)
    unk = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR, limit=10**9,
        stages=("frozen",),
    )
    assert compile_measure(spark, staged, unk).count() == hot + warm


def test_scan_only_opens_selected_stage(spark, staged):
    """The physical plan reads only the chosen tier's files."""
    schema = staged.get("g1", "measure", "metrics")
    hot_paths = resolve_stage_paths(schema, ("hot",))
    assert len(hot_paths) == 1 and hot_paths[0].endswith("hot")
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR, stages=("hot",),
    )
    plan = compile_measure(spark, staged, q)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "/hot" in plan and "/warm" not in plan


def test_bydbql_on_stages(spark, staged):
    """ON ... STAGES through the full BydbQL front end, measure + stream."""
    hot, warm = _counts(spark)
    got = execute(
        spark, staged,
        "SELECT * FROM MEASURE metrics IN g1 ON warm STAGES "
        "TIME BETWEEN '2024-01-01T00:00:00' AND '2024-02-01T00:00:00' "
        "LIMIT 1000000",
    )
    assert got.count() == warm
    # stream defaults cover both tiers; explicit ON (hot) narrows
    s_all = compile_stream(
        spark, staged,
        StreamQuery(groups=["g1"], name="event_log", time_range=TR, limit=10**9),
    ).count()
    s_hot = execute(
        spark, staged,
        "SELECT * FROM STREAM event_log IN g1 ON (hot) STAGES "
        "TIME BETWEEN '2024-01-01T00:00:00' AND '2024-02-01T00:00:00' "
        "LIMIT 1000000",
    ).count()
    assert s_hot < s_all


def test_show_top_on_stages(spark, staged):
    """SHOW TOP ... ON <stage> STAGES routes the materialization scan to the
    chosen tier only."""
    hot = execute(
        spark, staged,
        "SHOW TOP 3 FROM MEASURE metrics IN g1 ON hot STAGES "
        "TIME BETWEEN '2024-01-01T00:00:00' AND '2024-02-01T00:00:00'",
    )
    # every ranked point comes from the hot tier
    assert hot.agg(F.min("window_start")).head()[0] >= CUTOFF
    warm = execute(
        spark, staged,
        "SHOW TOP 3 FROM MEASURE metrics IN g1 ON warm STAGES "
        "TIME BETWEEN '2024-01-01T00:00:00' AND '2024-02-01T00:00:00'",
    )
    assert warm.agg(F.max("window_start")).head()[0] < CUTOFF


def test_lifecycle_migration(spark):
    """Hot→warm segment migration (banyand/backup/lifecycle/ analogue):
    aged segments move wholesale to the warm tier; no rows are lost or
    duplicated, and stage-routed queries see exactly the migrated split."""
    import tempfile

    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.sources.writer import (
        migrate_segments,
        write_measure,
    )

    d = tempfile.mkdtemp(prefix="lifecycle_")
    hot, warm = os.path.join(d, "hot"), os.path.join(d, "warm")
    try:
        cat0 = default_catalog(SF_SMALL)
        schema0 = cat0.get("g1", "measure", "metrics")
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        write_measure(ev, schema0, hot)
        total = spark.read.parquet(hot).count()

        # hot keeps 10 days as of Jan 31 -> segments before Jan 21 move
        n = migrate_segments(hot, warm, ttl_days=10, now=dt.datetime(2024, 1, 31))
        assert n > 0
        hot_rows = spark.read.parquet(hot).count()
        warm_rows = spark.read.parquet(warm).count()
        assert hot_rows + warm_rows == total  # nothing lost, nothing doubled
        assert spark.read.parquet(warm).agg(F.max("ts")).head()[0] \
            < dt.datetime(2024, 1, 21)

        # stage-routed reads see the split through the normal query path
        cat = Catalog()
        cat.register(
            MeasureSchema(
                group="g1", name="metrics", paths=(hot, warm), ts_column="ts",
                tags=(TagSpec("user_id", "INT"),
                      TagSpec("event_type", "STRING")),
                fields=(FieldSpec("value", "FLOAT"),),
                entity=("user_id",), version_column="event_id",
                stages=(StageSpec("hot", (hot,)), StageSpec("warm", (warm,))),
            )
        )
        q_warm = MeasureQuery(groups=["g1"], name="metrics", time_range=TR,
                              limit=10**9, stages=("warm",))
        got = compile_measure(spark, cat, q_warm)
        assert got.agg(F.max("ts")).head()[0] < dt.datetime(2024, 1, 21)
        # idempotent: nothing left to migrate at the same cutoff
        assert migrate_segments(hot, warm, 10, dt.datetime(2024, 1, 31)) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sharding_key_subset_validation():
    """Reference 0.11 CheckShardingKeySubset
    (api/validate/validate.go:226-255): sharding-key tags must be a
    same-relative-order subset of the entity tags; single-entity-tag
    schemas are exempt (composite identifiers); registration WARNS and
    continues, never rejects."""
    import warnings

    import pytest as _pytest

    from skywalking_banyandb_spark.catalog import (
        Catalog,
        MeasureSchema,
        check_sharding_key_subset,
    )

    def mk(entity, sharding):
        return MeasureSchema(
            group="g1", name="m", paths=(), ts_column="ts", tags=(),
            fields=(), entity=entity, sharding_key=sharding)

    # valid subsets (order preserved) and the exemptions
    assert check_sharding_key_subset(mk(("a", "b", "c"), ("a", "c"))) is None
    assert check_sharding_key_subset(mk(("a", "b", "c"), ())) is None
    assert check_sharding_key_subset(mk(("composite",), ("svc",))) is None
    # missing tag
    w = check_sharding_key_subset(mk(("a", "b"), ("z",)))
    assert w is not None and "'z'" in w and "not present" in w
    # order violation
    w = check_sharding_key_subset(mk(("a", "b", "c"), ("c", "a")))
    assert w is not None and "relative order" in w
    # registry behavior: warn, then still registered
    cat = Catalog()
    bad = mk(("a", "b"), ("b", "a"))
    with _pytest.warns(UserWarning, match="relative order"):
        cat.register(bad)
    assert cat.get("g1", "measure", "m") is bad
    good = mk(("a", "b"), ("a",))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cat.register(good)


def test_entire_group_deletion(tmp_path):
    """Reference 0.10 DeleteGroup (metadata/schema/schema.go:172): every
    resource of the group disappears, data directories go with it when
    asked, the revision bumps (pinned queries fail fast), and other
    groups are untouched."""
    import os

    import pytest as _pytest

    from skywalking_banyandb_spark.catalog import (
        Catalog,
        MeasureSchema,
        StreamSchema,
    )
    from skywalking_banyandb_spark.errors import QueryAnalyzeError, SchemaError

    d1 = tmp_path / "m1"
    d1.mkdir()
    (d1 / "x.parquet").write_bytes(b"stub")
    cat = Catalog()
    cat.register(MeasureSchema(
        group="gx", name="m1", paths=(str(d1),), ts_column="ts",
        tags=(), fields=(), entity=()))
    cat.register(StreamSchema(
        group="gx", name="s1", paths=(), ts_column="ts",
        element_id_column="eid", tags=()))
    cat.register(MeasureSchema(
        group="gy", name="m1", paths=(), ts_column="ts",
        tags=(), fields=(), entity=()))
    rev_before = cat.mod_revision("gx")

    assert cat.delete_group("gx", remove_data=True) == 2
    with _pytest.raises(SchemaError):
        cat.get("gx", "measure", "m1")
    with _pytest.raises(SchemaError):
        cat.get("gx", "stream", "s1")
    assert not os.path.exists(d1)
    # the surviving group is untouched
    assert cat.get("gy", "measure", "m1").group == "gy"
    # revision bumped -> pinned queries fail fast
    assert cat.mod_revision("gx") == rev_before + 1
    with _pytest.raises(QueryAnalyzeError):
        cat.check_revisions({"gx": rev_before})
    # deleting a vanished group is a no-op
    assert cat.delete_group("gx") == 0


def test_shape_break_entity_change_rejected():
    """Replay of test/cases/schema/shape_break.go + apply_rollback.go:
    an update changing the measure entity is REJECTED and leaves
    mod_revision AND the stored schema (incl. created_at) unchanged; the
    sanctioned path is delete + recreate, which drops old data; an
    accepted update inherits created_at when not restated."""
    import datetime as dt

    import pytest as _pytest

    from skywalking_banyandb_spark.catalog import Catalog, MeasureSchema
    from skywalking_banyandb_spark.errors import SchemaError

    t0 = dt.datetime(2024, 1, 1)
    cat = Catalog()
    orig = MeasureSchema(
        group="g", name="m", paths=(), ts_column="ts", tags=(),
        fields=(), entity=("a", "b"), created_at=t0)
    cat.register(orig)
    rev = cat.mod_revision("g")

    broken = MeasureSchema(
        group="g", name="m", paths=(), ts_column="ts", tags=(),
        fields=(), entity=("a",))  # entity change
    with _pytest.raises(SchemaError, match="entity change"):
        cat.register(broken)
    # rejected update: revision and stored schema untouched
    assert cat.mod_revision("g") == rev
    assert cat.get("g", "measure", "m") is orig

    # accepted same-entity update: revision bumps, created_at inherited
    upd = MeasureSchema(
        group="g", name="m", paths=("/tmp/x",), ts_column="ts", tags=(),
        fields=(), entity=("a", "b"))
    cat.register(upd)
    assert cat.mod_revision("g") == rev + 1
    assert cat.get("g", "measure", "m").created_at == t0

    # delete + recreate with the new shape is the sanctioned path
    assert cat.delete_resource("g", "measure", "m") is True
    cat.register(broken)
    assert cat.get("g", "measure", "m").entity == ("a",)


def test_tag_family_move_is_transparent(spark):
    """Replay of test/cases/schema/tag_family_move.go: moving a tag
    between families (searchable <-> storage-only) must keep writes and
    queries working unchanged. In this engine a family is a logical
    GROUPING attribute on the column (the physical layout is columnar
    parquet either way), so the move is metadata-only: the re-registered
    schema answers the same query with identical rows, and family-
    qualified projection reflects the new family."""
    import dataclasses as dc

    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.model import (
        BinaryOp,
        StreamQuery,
        TimeRange,
        cond,
    )
    from skywalking_banyandb_spark.plans.stream import compile_stream

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "stream", "event_log")
    q = StreamQuery(
        groups=["g1"], name="event_log",
        time_range=TimeRange.of("2024-01-01T00:00:00",
                                "2024-02-01T00:00:00"),
        criteria=cond("event_type", BinaryOp.EQ, "click"),
        projection=["user_id", "event_type"], limit=20,
    )
    before = [tuple(r) for r in compile_stream(spark, cat, q).collect()]
    assert len(before) == 20

    moved_tags = tuple(
        dc.replace(t, family="storage" if t.name == "event_type"
                   else t.family)
        for t in schema.tags)
    cat.register(dc.replace(schema, tags=moved_tags))
    after = [tuple(r) for r in compile_stream(spark, cat, q).collect()]
    assert after == before
    assert cat.get("g1", "stream", "event_log") \
        .tag("event_type").family == "storage"


def test_created_at_not_inherited_across_delete_recreate():
    """Replay of test/cases/schema/tombstone_gc.go's query-visible rule:
    created_at survives UPDATES (apply_rollback) but NOT delete +
    recreate — the recreated schema gets a fresh first-appearance stamp
    (here: whatever the new registration declares, never the deleted
    one's)."""
    import datetime as dt

    from skywalking_banyandb_spark.catalog import Catalog, MeasureSchema

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    cat = Catalog()
    cat.register(MeasureSchema(
        group="g", name="m", paths=(), ts_column="ts", tags=(),
        fields=(), entity=("a",), created_at=t0))
    assert cat.delete_resource("g", "measure", "m") is True
    # recreate: fresh stamp, not the tombstoned one
    cat.register(MeasureSchema(
        group="g", name="m", paths=(), ts_column="ts", tags=(),
        fields=(), entity=("a",), created_at=t1))
    assert cat.get("g", "measure", "m").created_at == t1
    # recreate without a stamp stays unstamped (no inheritance)
    assert cat.delete_resource("g", "measure", "m") is True
    cat.register(MeasureSchema(
        group="g", name="m", paths=(), ts_column="ts", tags=(),
        fields=(), entity=("a",)))
    assert cat.get("g", "measure", "m").created_at is None
