"""Bucketed write path: the co-located-join lever for fact-fact joins.

Pins the property that justifies bucketing at 100 TB: two tables
bucketed on the join key with the same bucket count join with NO
Exchange on either side (each bucket zips locally), while the same join
over plain parquet shuffles both sides.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.sources.writer import write_bucketed_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed_table(
        li, "t_li_bucketed", ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"]
    )
    write_bucketed_table(
        orders, "t_ord_bucketed", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"]
    )
    yield "t_li_bucketed", "t_ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def _join(li, orders):
    return li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty"))


@pytest.mark.slow  # r12: excluded from the driver-completable fast gate (make test-full runs it)
def test_bucketed_join_has_no_exchange_before_the_join(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    # force the SMJ path: at test scale the small side would broadcast,
    # which hides the property under test (at 100 TB neither fact side
    # fits a broadcast)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            _join(spark.table(li_t), spark.table(ord_t))
            ._jdf.queryExecution().executedPlan().toString()
        )
        # children of the join print below it; the aggregate's exchange
        # prints above, so the tail holds only the join's input plans
        assert "SortMergeJoin" in plan, plan
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, plan
        assert "SelectedBucketsCount: 8 out of 8" in join_part, plan

        # the unbucketed baseline DOES shuffle both sides
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        base = (
            _join(li, orders)._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in base, base
        assert "Exchange" in base.split("SortMergeJoin")[-1], base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_join_matches_unbucketed_results(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    got = {
        r["o_orderpriority"]: float(r["qty"])
        for r in _join(spark.table(li_t), spark.table(ord_t)).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = {
        r["o_orderpriority"]: float(r["qty"]) for r in _join(li, orders).collect()
    }
    assert got == pytest.approx(want)


class TestPartitionPruning:
    def test_date_predicate_prunes_partitions(self, spark, tmp_path):
        """write_metrics_table's date layout must actually prune: a
        single-date predicate reaches the scan as a PartitionFilter and
        only that date's files are read (SURVEY §4 row 1)."""
        import datetime as dt

        from clickhouse_metrics_pipeline_spark.sources.writer import (
            read_metrics_table,
            write_metrics_table,
        )

        rows = [
            ("w1", s, "m", "svc", dt.datetime(2024, 1, d, 12, 0, 0), float(s))
            for d in (1, 2, 3)
            for s in range(4)
        ]
        df = spark.createDataFrame(
            rows,
            "workspaceId STRING, series_hash BIGINT, metric STRING, "
            "serviceName STRING, timestamp TIMESTAMP, value DOUBLE",
        )
        path = str(tmp_path / "metrics")
        write_metrics_table(df, path, mode="overwrite")

        back = read_metrics_table(spark, path)
        q = back.where(F.col("date") == "2024-01-02")
        plan = q._jdf.queryExecution().executedPlan().toString()
        # the date predicate must reach the scan node as a PartitionFilter
        # (inputFiles() reports the unpruned relation, so the plan is the
        # observable proof)
        assert "PartitionFilters" in plan and "2024-01-02" in plan
        assert q.count() == 4
        assert read_metrics_table(spark, path).count() == 12


class TestRetentionSweep:
    def _write_days(self, spark, path, days):
        import datetime as dt

        rows = []
        for i, day in enumerate(days):
            d = dt.datetime.fromisoformat(day)
            rows.append((i, d + dt.timedelta(hours=6)))
            rows.append((1000 + i, d + dt.timedelta(hours=18)))
        df = spark.createDataFrame(rows, "id BIGINT, timestamp TIMESTAMP")
        (
            df.withColumn("date", F.to_date("timestamp"))
            .write.mode("overwrite")
            .partitionBy("date")
            .parquet(path)
        )

    def test_drops_only_fully_expired_partitions(self, spark, tmp_path):
        import datetime as dt

        from clickhouse_metrics_pipeline_spark.sources.writer import (
            retention_sweep,
        )

        base = str(tmp_path / "tbl")
        self._write_days(
            spark, base, ["2026-08-01", "2026-08-05", "2026-08-10", "2026-08-12"]
        )
        now = dt.datetime(2026, 8, 13, 12, 0, 0)  # horizon 2026-08-10 12:00
        res = retention_sweep(spark, base, retention_days=3, now=now)
        assert res["dropped"] == ["date=2026-08-01", "date=2026-08-05"]
        assert res["kept"] == ["date=2026-08-10", "date=2026-08-12"]
        assert res["rewritten"] == []
        # table still readable, partition pruning column intact
        left = spark.read.parquet(base)
        assert left.count() == 4
        assert sorted(r.date.isoformat() for r in left.select("date").distinct().collect()) == [
            "2026-08-10", "2026-08-12",
        ]

    def test_boundary_rewrite_filters_rows(self, spark, tmp_path):
        import datetime as dt

        from clickhouse_metrics_pipeline_spark.sources.writer import (
            retention_sweep,
        )

        base = str(tmp_path / "tbl2")
        self._write_days(spark, base, ["2026-08-10", "2026-08-12"])
        now = dt.datetime(2026, 8, 13, 12, 0, 0)
        res = retention_sweep(
            spark, base, retention_days=3, now=now, rewrite_boundary=True
        )
        assert res["rewritten"] == ["date=2026-08-10"]
        left = spark.read.parquet(base)
        # 2026-08-10 06:00 expired (< 10th 12:00); 18:00 survives
        assert left.count() == 3
        assert left.filter("timestamp < '2026-08-10 12:00:00'").count() == 0
        # idempotent: second sweep is a no-op
        res2 = retention_sweep(
            spark, base, retention_days=3, now=now, rewrite_boundary=True
        )
        assert spark.read.parquet(base).count() == 3


class TestCompaction:
    def _fragment(self, spark, path, n_files=12, rows_per_file=50):
        """One date partition fragmented into many tiny files (the shape
        a 10 s streaming flush leaves behind)."""
        import datetime as dt

        d = dt.datetime(2026, 8, 10, 0, 0, 0)
        rows = [
            (i, d + dt.timedelta(seconds=i), f"m{i % 3}")
            for i in range(n_files * rows_per_file)
        ]
        df = spark.createDataFrame(
            rows, "id BIGINT, timestamp TIMESTAMP, metric STRING"
        )
        (
            df.repartition(n_files)
            .withColumn("date", F.to_date("timestamp"))
            .write.mode("append")
            .partitionBy("date")
            .parquet(path)
        )

    def _data_files(self, tmp_path, part):
        import os

        return [
            f
            for f in os.listdir(str(tmp_path / "frag" / part))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]

    def test_compacts_fragmented_partition_preserving_rows(
        self, spark, tmp_path
    ):
        from clickhouse_metrics_pipeline_spark.sources.writer import (
            compact_partitions,
        )

        base = str(tmp_path / "frag")
        self._fragment(spark, base, n_files=12)
        part = "date=2026-08-10"
        assert len(self._data_files(tmp_path, part)) >= 12
        before = sorted(
            (r.id, r.timestamp, r.metric)
            for r in spark.read.parquet(base).collect()
        )
        res = compact_partitions(
            spark, base, max_files=4, sort_key=["metric", "timestamp"]
        )
        assert len(res["compacted"]) == 1
        assert res["compacted"][0].startswith(f"{part}:")
        n_after = len(self._data_files(tmp_path, part))
        assert n_after <= 4
        after = sorted(
            (r.id, r.timestamp, r.metric)
            for r in spark.read.parquet(base).collect()
        )
        assert after == before
        # idempotent: second sweep skips the now-compacted partition
        res2 = compact_partitions(spark, base, max_files=4)
        assert res2["compacted"] == []
        assert res2["skipped"] == [part]

    def test_large_files_never_touched(self, spark, tmp_path):
        from clickhouse_metrics_pipeline_spark.sources.writer import (
            compact_partitions,
        )

        base = str(tmp_path / "frag")
        self._fragment(spark, base, n_files=12)
        # tiny target: mean file size is already >= target -> skip
        res = compact_partitions(
            spark, base, max_files=4, target_file_bytes=1
        )
        assert res["compacted"] == []

    def test_stale_trash_dir_fails_loudly(self, spark, tmp_path):
        import os

        import pytest as _pytest

        from clickhouse_metrics_pipeline_spark.sources.writer import (
            compact_partitions,
        )

        base = str(tmp_path / "frag")
        self._fragment(spark, base, n_files=12)
        os.makedirs(str(tmp_path / "frag" / ".date=2026-08-10__rewrite_old"))
        with _pytest.raises(IOError, match="stale artifact"):
            compact_partitions(spark, base, max_files=4)

    def test_stale_tmp_dir_self_heals(self, spark, tmp_path):
        """r10 verdict item 3: a ``__rewrite_tmp`` dir WITHOUT the
        ``__rewrite_old`` trash means the crash hit between the tmp
        write and the first rename — the live partition is intact and
        the tmp holds only an incomplete replacement. The next sweep
        must delete the tmp and proceed instead of poisoning every
        subsequent run until a human deletes it."""
        import os

        from clickhouse_metrics_pipeline_spark.sources.writer import (
            compact_partitions,
        )

        base = str(tmp_path / "frag")
        self._fragment(spark, base, n_files=12)
        part = "date=2026-08-10"
        stale = tmp_path / "frag" / f".{part}__rewrite_tmp"
        os.makedirs(str(stale))
        with open(str(stale / "leftover.parquet"), "wb") as f:
            f.write(b"not a real parquet file")
        before = sorted(
            (r.id, r.timestamp, r.metric)
            for r in spark.read.parquet(base).collect()
        )
        res = compact_partitions(
            spark, base, max_files=4, sort_key=["metric", "timestamp"]
        )
        assert len(res["compacted"]) == 1
        assert not os.path.exists(str(stale))
        after = sorted(
            (r.id, r.timestamp, r.metric)
            for r in spark.read.parquet(base).collect()
        )
        assert after == before
