"""Round-6 fixes, each failing on the round-5 code.

Covers: the SHRED_LSN apply-time fence (VERDICT r5 What's-wrong #4), the
FLAC corruption-contract holes (ADVICE r5: struct.error on truncation
before the frame CRC-16, OverflowError in the MD5 recompute), and the
encoder's invalid-partition-order stream (ADVICE r5)."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigquery_etl_fork_spark.engine import CDCEngine  # noqa: E402
from bigquery_etl_fork_spark.engine.shredder import SHRED_LSN  # noqa: E402
from bigquery_etl_fork_spark.lake import LakeTable  # noqa: E402
from bigquery_etl_fork_spark.operators.flac import decode_flac, encode_flac  # noqa: E402

EV_SCHEMA = "doc_id string, tokens array<int>, lsn long, op string"
TBL_SCHEMA = "doc_id string, tokens array<int>"


def _table(spark, path):
    df = spark.createDataFrame([("d0", [1, 2])], TBL_SCHEMA)
    t = LakeTable.create(
        spark, str(path), df.schema, num_buckets=8, properties={"key_col": "doc_id"}
    )
    t.overwrite_all(df, key_col="doc_id")
    return t


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_lsn_at_or_above_shred_sentinel_rejected(spark, tmp_path, mode):
    """An epoch carrying lsn >= SHRED_LSN (2^62) must be rejected loudly:
    silently accepting it would let a real binlog row outrank a GDPR
    tombstone in LWW resolution. The fence is free (the epoch's max lsn is
    already computed for lineage on both storage paths)."""
    t = _table(spark, tmp_path / f"t_{mode}")
    eng = CDCEngine(spark, t, key="doc_id", order="lsn",
                    storage_mode=mode, count_input=False)
    bad = spark.createDataFrame([("d1", [3], SHRED_LSN, "I")], EV_SCHEMA)
    with pytest.raises(ValueError, match="SHRED_LSN"):
        eng.apply_epoch(1, bad)
    # nothing committed: watermark unset, state unchanged
    assert t.snapshot.properties.get("epoch_watermark", -1) == -1
    assert t.read(key_col="doc_id").count() == 1
    # a sane epoch still applies (the failed attempt left only vacuumables)
    ok = spark.createDataFrame([("d1", [3], SHRED_LSN - 1, "I")], EV_SCHEMA)
    eng.apply_epoch(1, ok)
    assert t.read(key_col="doc_id").count() == 2


def test_rotation_alternation_restores_r5_invisible_rows():
    """VERDICT r5 #2: the 9 rows the r5 driver cap rotated out must sit
    inside the first 50 this round, and the round-6 tail must consist only
    of rows that were driver-green in CORRECTNESS_r05 (so no query lacks a
    driver-green record for 2+ consecutive rounds)."""
    import json

    from bigquery_etl_fork_spark.queries import (
        _TAIL_SET_A,
        _TAIL_SET_B,
        _TAIL_THIS_ROUND,
        ORACLES,
        QUERIES,
    )

    order = list(QUERIES)
    assert list(ORACLES) == [k for k in order if k in ORACLES]
    for name in _TAIL_SET_A:  # invisible in r5 -> must be recorded in r6
        assert order.index(name) < 50, (name, order.index(name))
    assert _TAIL_THIS_ROUND == _TAIL_SET_B
    r5_path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "CORRECTNESS_r05.json")
    if os.path.exists(r5_path):
        with open(r5_path) as fh:
            r5 = json.load(fh)
        for name in _TAIL_SET_B:  # sacrificed this round -> green last round
            assert r5[name]["hash_match"], name


def test_expire_snapshots_respects_consumer_floor(spark, tmp_path):
    """VERDICT r5 #3: a registered change-feed consumer's refreshed-through
    version fences snapshot expiry — versions at or above the floor stay
    regardless of keep_last; deregistering releases them."""
    df = spark.createDataFrame([("d0", [1])], TBL_SCHEMA)
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, num_buckets=4,
                         properties={"key_col": "doc_id"})
    t.overwrite_all(df, key_col="doc_id")
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
    for e in range(1, 6):
        eng.apply_epoch(e, spark.createDataFrame(
            [(f"d{e}", [e], 100 + e, "U")], EV_SCHEMA))
    head = t.snapshot.version
    t.register_consumer("rollup:test_mv", 2)
    removed = t.expire_snapshots(keep_last=1)
    assert removed > 0
    d = str(tmp_path / "t" / "_snapshots")
    left = sorted(int(f[5:-5]) for f in os.listdir(d) if f.startswith("snap-"))
    assert left[0] == 2 and left[-1] == head, left  # floor kept, below dropped
    # the consumer's feed base survives: changes() over its range derivable
    assert t.changes(2, head, key_col="doc_id").count() > 0
    t.deregister_consumer("rollup:test_mv")
    t.expire_snapshots(keep_last=1)
    left = [f for f in os.listdir(d) if f.startswith("snap-")]
    assert len(left) == 1


def test_auto_maintenance_bounds_snapshots_and_dead_files(spark, tmp_path):
    """VERDICT r5 #5: with auto_expire_keep set, a bare replay loop keeps
    the manifest chain and dead files bounded with no harness maintenance
    calls — and the state stays correct."""
    df = spark.createDataFrame([(f"d{i}", [i]) for i in range(20)], TBL_SCHEMA)
    t = LakeTable.create(spark, str(tmp_path / "t"), df.schema, num_buckets=4,
                         properties={"key_col": "doc_id"})
    t.overwrite_all(df, key_col="doc_id")
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False,
                    auto_expire_keep=3, auto_vacuum_every=2)
    for e in range(1, 9):
        eng.apply_epoch(e, spark.createDataFrame(
            [(f"d{(e * 7 + j) % 30}", [e, j], e * 100 + j, "U")
             for j in range(5)], EV_SCHEMA))
    snap_dir = str(tmp_path / "t" / "_snapshots")
    n_snaps = len([f for f in os.listdir(snap_dir) if f.startswith("snap-")])
    # 8 epochs -> >=9 commits without maintenance; bounded to keep+cadence
    assert n_snaps <= 3 + 2 * 2, n_snaps
    # state still exact: every surviving key holds its last write
    got = {r["doc_id"]: r["tokens"] for r in t.read(key_col="doc_id").collect()}
    for e in range(1, 9):
        for j in range(5):
            k = f"d{(e * 7 + j) % 30}"
            # recompute the last (e, j) that wrote k
            last = max(
                ((ee, jj) for ee in range(1, 9) for jj in range(5)
                 if f"d{(ee * 7 + jj) % 30}" == k),
                key=lambda p: p[0] * 100 + p[1],
            )
            assert got[k] == list(last), (k, got[k], last)


def test_retention_race_tailer_refresher_vacuum(tmp_path):
    """VERDICT r5 #4 'Done' criterion: tailer (max-pressure auto-expiry)
    ∥ rollup refresher ∥ external vacuum loop — no refresh ever falls back
    to full recompute, final state exact, snapshot chain bounded."""
    import json as _json
    import subprocess

    drive = os.path.join(os.path.dirname(__file__), "drive_retention_race.py")
    work = str(tmp_path / "ret")
    os.makedirs(work)

    def run(*args, timeout=300):
        out = subprocess.run([sys.executable, drive, *args],
                             capture_output=True, text=True, timeout=timeout)
        assert out.returncode == 0, out.stderr[-2000:]
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        return _json.loads(line)

    assert run("gen", work)["bootstrap_mode"] == "full"
    procs = [
        subprocess.Popen([sys.executable, drive, role, work],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for role in ("tailer", "refresher", "vacuum")
    ]
    outs = {}
    for p in procs:
        so, se = p.communicate(timeout=300)
        assert p.returncode == 0, se[-2000:]
        rec = _json.loads([ln for ln in so.splitlines() if ln.startswith("{")][-1])
        outs[rec["phase"]] = rec
    # the refresher interleaved AND never degraded to a full recompute
    assert "incremental" in outs["refresher"]["modes"], outs["refresher"]
    assert outs["refresher"]["full_count"] == 0, outs["refresher"]
    assert outs["vacuum"]["cycles"] >= 1
    res = run("check", work)
    assert res["ok"], res
    # expiry actually ran under the fence: chain bounded, not O(commits)
    assert res["snapshots_on_disk"] <= 12, res


def test_bloom_build_never_reads_data_columns_on_the_driver(
    spark, tmp_path, monkeypatch
):
    """VERDICT r5 #1: the per-file key-bloom fold was the one remaining
    driver-side step proportional to delta data. It now runs executor-side
    (one distributed job, one task per fresh file). Pin it by making any
    DRIVER-process pq.read_table call explode — executor python workers are
    separate processes, so the patch can't leak there — and assert the
    bloom sidecar still gets built and still prunes."""
    import bigquery_etl_fork_spark.lake.table as table_mod

    df = spark.createDataFrame(
        [(f"d{i}", [i]) for i in range(50)], TBL_SCHEMA
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=4,
        properties={"key_col": "doc_id", "delta_key_bloom": True},
    )
    t.overwrite_all(df, key_col="doc_id")

    def boom(*a, **kw):
        raise AssertionError(
            "driver-side pq.read_table of data — the bloom fold must be "
            "executor-side"
        )

    monkeypatch.setattr(table_mod.pq, "read_table", boom)
    eng = CDCEngine(spark, t, key="doc_id", order="lsn", count_input=False)
    ev = spark.createDataFrame(
        [(f"d{i}", [i * 2], 100 + i, "U") for i in range(10)], EV_SCHEMA
    )
    eng.apply_epoch(1, ev)
    monkeypatch.undo()

    # sidecar exists and carries one bloom per fresh delta file
    sidecars = [
        os.path.join(dp, fn)
        for dp, _dn, fns in os.walk(str(tmp_path / "t"))
        for fn in fns
        if fn == "_blooms.json"
    ]
    assert sidecars, "no bloom sidecar written"
    # and the blooms actually prune: a key the epoch never touched skips
    # every delta file of its bucket
    t.read(key_col="doc_id", keys=["d40"])
    st = t.last_read_stats
    assert st is not None and st["delta_files_kept"] == 0, st
    # a touched key keeps its delta file (never a false negative)
    got = t.read(key_col="doc_id", keys=["d3"]).where(F.col("doc_id") == "d3")
    assert got.collect()[0]["tokens"] == [6]


def test_keyed_lookup_prunes_across_auto_rebucket_boundaries(spark, tmp_path):
    """VERDICT r5 #8: a table that grows through auto-rebuckets mid-replay
    must keep key-targeted file pruning working across each boundary —
    rebucket() rewrites base files key-clustered (fresh zone maps in the
    NEW bucket space) and post-rebucket deltas carry blooms in the new
    space, so stale old-space metadata can never mis-prune."""
    df = spark.createDataFrame(
        [(f"d{i:05d}", [i]) for i in range(400)], TBL_SCHEMA
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df.schema, num_buckets=2,
        properties={"key_col": "doc_id", "delta_key_bloom": True,
                    "max_file_rows": 100},
    )
    t.overwrite_all(df, key_col="doc_id")
    eng = CDCEngine(
        spark, t, key="doc_id", order="lsn", count_input=False,
        # tiny threshold so growth fires during this replay: 2 -> 4 -> 8
        auto_rebucket_bytes_per_bucket=4_000, auto_rebucket_factor=2,
        auto_rebucket_max_buckets=8,
    )
    counts_seen = {t.num_buckets}
    expected: dict[str, list[int]] = {f"d{i:05d}": [i] for i in range(400)}
    e = 0
    while len(counts_seen) < 3 and e < 30:
        e += 1
        rows = [(f"d{(e * 97 + j):05d}", [e, j], e * 1000 + j, "U")
                for j in range(40)]
        for k, tok, _l, _o in rows:
            expected[k] = tok
        eng.apply_epoch(e, spark.createDataFrame(rows, EV_SCHEMA))
        counts_seen.add(t.num_buckets)
        # pruning assert AT EVERY boundary state: a touched key reads
        # correct and an untouched cold key prunes its delta files
        probe = [f"d{(e * 97):05d}", "d00001"]
        got = {r["doc_id"]: r["tokens"]
               for r in t.read(key_col="doc_id", keys=probe).where(
                   F.col("doc_id").isin(probe)).collect()}
        assert got == {k: expected[k] for k in probe}, (e, got)
        st = t.last_read_stats
        assert st["base_files_kept"] < max(st["base_files_total"], 2), (e, st)
    assert counts_seen == {2, 4, 8}, counts_seen
    # final full-state equality — growth changed no logical row
    final = {r["doc_id"]: r["tokens"] for r in t.read(key_col="doc_id").collect()}
    assert final == expected


def test_flac_truncation_sweep_raises_only_notimplemented():
    """decode_flac's corruption contract is NotImplementedError (that is all
    decode_media catches); a stream truncated at ANY byte boundary must not
    escape as struct.error / IndexError / OverflowError (ADVICE r5
    reproduced struct.error at the frame-CRC-16 unpack)."""
    rng = np.random.default_rng(11)
    x = rng.integers(-2000, 2000, size=(40,)).astype(np.int64)
    blob = encode_flac(x, rate=8000, bps=16, block_size=32)
    for i in range(len(blob)):
        with pytest.raises(NotImplementedError):
            decode_flac(blob[:i])


def test_flac_corrupt_payload_never_overflows_md5_recompute():
    """Flip bits inside the frame payload (past the header, before the
    CRC): whatever the decoder makes of it — CRC mismatch, bad residuals,
    out-of-range samples — the failure must surface as
    NotImplementedError, never OverflowError from the MD5 serialization."""
    rng = np.random.default_rng(13)
    x = rng.integers(-30000, 30000, size=(64,)).astype(np.int64)
    blob = encode_flac(x, rate=8000, bps=16, block_size=64)
    for pos in range(46, len(blob)):  # past fLaC + STREAMINFO (4+4+34=42) + sync
        mutated = bytearray(blob)
        mutated[pos] ^= 0xFF
        try:
            decode_flac(bytes(mutated))
        except NotImplementedError:
            pass  # the contract
        # any other exception type propagates and fails the test


def test_flac_short_final_frame_with_partition_order_roundtrips():
    """ADVICE r5: partition_order>0 with a final frame whose blocksize is
    not divisible by 2**porder used to emit an invalid stream (partition
    counts no longer summed to bs-order). The encoder now falls back to
    one partition for that frame; full-length frames keep the requested
    partitioning."""
    rng = np.random.default_rng(17)
    x = rng.integers(-5000, 5000, size=(300,)).astype(np.int64)
    # frames: 256 (porder 3 valid) + 44 (44 % 8 != 0 -> fallback)
    blob = encode_flac(x, rate=16000, bps=16, block_size=256, partition_order=3)
    decoded, rate, bps = decode_flac(blob)
    assert rate == 16000 and bps == 16
    np.testing.assert_array_equal(decoded[:, 0], x)


def test_flac_partition_order_too_deep_for_order_falls_back():
    """(bs >> porder) <= order is the other invalid shape: 32-sample frame,
    porder 4 -> 2 samples/partition <= fixed order 2."""
    rng = np.random.default_rng(19)
    x = rng.integers(-500, 500, size=(32,)).astype(np.int64)
    blob = encode_flac(x, rate=8000, bps=16, block_size=32, partition_order=4)
    decoded, _, _ = decode_flac(blob)
    np.testing.assert_array_equal(decoded[:, 0], x)
