"""Automatic device-memory planning (cuclark_tpu.memplan) — the TPU
analog of the reference's free-VRAM probe + RESERVED + swap-cycle
planning (src/CuClarkDB.cu:540-574, :171-175, src/parameters.hh:45)."""

import numpy as np
import pytest

from cuclark_tpu import codec, memplan
from cuclark_tpu.config import ClassifyConfig, DBConfig
from cuclark_tpu.hashdb import build_table
from cuclark_tpu.memplan import (RESERVED_MB, device_memory_budget_mb,
                                 plan_db_axis, plan_stream_parts,
                                 resolve_table_budget_mb)


class FakeDev:
    def __init__(self, platform="tpu", stats=None, raise_stats=False,
                 device_kind="TPU v5 lite"):
        self.platform = platform
        self.device_kind = device_kind
        self._stats = stats
        self._raise = raise_stats

    def memory_stats(self):
        if self._raise:
            raise RuntimeError("unsupported")
        return self._stats


def test_budget_from_memory_stats():
    dev = FakeDev(stats={"bytes_limit": 2_000_000_000,
                         "bytes_in_use": 500_000_000})
    got = device_memory_budget_mb(dev)
    assert got == pytest.approx((2e9 - 5e8) / 1e6 - RESERVED_MB)


def test_budget_prefers_reservable_limit():
    # bytes_reservable_limit excludes runtime-reserved regions and wins
    # over the raw bytes_limit when both are reported
    dev = FakeDev(stats={"bytes_limit": 2_000_000_000,
                         "bytes_reservable_limit": 1_500_000_000,
                         "bytes_in_use": 0})
    got = device_memory_budget_mb(dev)
    assert got == pytest.approx(1.5e9 / 1e6 - RESERVED_MB)


def test_budget_platform_default_when_stats_unavailable():
    dev = FakeDev(raise_stats=True)
    got = device_memory_budget_mb(dev)
    assert got == pytest.approx(16384.0 * 0.9 - RESERVED_MB)


@pytest.mark.parametrize("kind,hbm_mb", [
    ("TPU v2", 8192.0),
    ("TPU v3", 16384.0),
    ("TPU v4", 32768.0),
    ("TPU v5 lite", 16384.0),
    ("TPU v5e", 16384.0),
    ("TPU v5p", 95000.0),
    ("TPU v5", 95000.0),
    ("TPU v6 lite", 32768.0),
    ("TPU v6e", 32768.0),
    ("TPU vX future", 16384.0),  # unknown generation -> safe fallback
])
def test_budget_generation_defaults(kind, hbm_mb):
    dev = FakeDev(raise_stats=True, device_kind=kind)
    got = device_memory_budget_mb(dev)
    assert got == pytest.approx(hbm_mb * 0.9 - RESERVED_MB)


def test_v5p_without_stats_keeps_4gb_table_resident():
    """A v5p whose runtime reports no memory stats must plan a 4 GB
    table RESIDENT (95 GB HBM), not stream it 8 ways as the old single
    16 GB fallback would at tighter margins."""
    dev = FakeDev(raise_stats=True, device_kind="TPU v5p")
    budget = device_memory_budget_mb(dev)
    table_bytes = 4 * 10 ** 9
    assert plan_stream_parts(table_bytes, budget, 1, 1 << 27) == 1
    assert plan_db_axis(table_bytes, budget, 8) == 1


def test_budget_cpu_is_unbounded():
    assert device_memory_budget_mb(FakeDev(platform="cpu")) is None


def test_budget_floor():
    dev = FakeDev(stats={"bytes_limit": 100_000_000, "bytes_in_use": 0})
    assert device_memory_budget_mb(dev) == 64.0


def test_explicit_flag_wins():
    assert resolve_table_budget_mb(123.0, FakeDev()) == 123.0


def test_plan_stream_parts():
    # 1 GB table, 100 MB budget, no mesh: 16 parts of 64 MB fit
    assert plan_stream_parts(10 ** 9, 100.0, 1, 1 << 20) == 16
    # split 4 ways across a mesh first: 4 parts of 62.5 MB
    assert plan_stream_parts(10 ** 9, 100.0, 4, 1 << 20) == 4
    assert plan_stream_parts(10 ** 9, None, 1, 1 << 20) == 1
    assert plan_stream_parts(10 ** 6, 100.0, 1, 1 << 20) == 1


def test_plan_db_axis():
    assert plan_db_axis(10 ** 9, 100.0, 8) == 8  # capped at devices
    assert plan_db_axis(10 ** 9, 300.0, 8) == 4
    assert plan_db_axis(10 ** 9, None, 8) == 1
    assert plan_db_axis(10 ** 6, 100.0, 8) == 1


@pytest.fixture()
def small_db():
    rng = np.random.default_rng(3)
    km = np.unique(codec.canonical_np(
        rng.integers(0, 1 << 62, size=30_000, dtype=np.uint64), 31))
    labels = rng.integers(1, 17, size=len(km)).astype(np.uint32)
    names = ["NA"] + [f"T{i}" for i in range(1, 17)]
    return build_table(km, labels, names, DBConfig(k=31))


def test_auto_budget_streams_oversized_table(monkeypatch, small_db):
    """A table larger than the (simulated) device budget streams with NO
    --max-table-mb flag and classifies identically to resident mode."""
    from cuclark_tpu.pipeline import Classifier

    rng = np.random.default_rng(4)
    base = np.frombuffer(b"ACGT", np.uint8)
    reads = [(f"r{i}", base[rng.integers(0, 4, size=100)].tobytes())
             for i in range(64)]

    resident = Classifier(small_db, ClassifyConfig(batch_reads=32))
    assert resident.stream_parts == 1
    want = [r["best"] for r in resident.classify_records(iter(reads))]

    # simulate a device whose budget holds only ~1/4 of the table
    tiny = small_db.table.nbytes / 4 / 1e6
    monkeypatch.setattr(memplan, "device_memory_budget_mb",
                        lambda device=None: tiny)
    auto = Classifier(small_db, ClassifyConfig(batch_reads=32))
    assert auto.stream_parts >= 4
    got = [r["best"] for r in auto.classify_records(iter(reads))]
    assert got == want
