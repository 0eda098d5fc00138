"""Automatic device-memory planning for the DB table.

The reference probes each device's free VRAM, reserves RESERVED MB for
batch buffers, aborts below 1 GB free, and derives its swap-cycle plan
`cyclesPerDevice x numDevices x dbPartsPerDevice` from what remains
(src/CuClarkDB.cu:540-574 planning, :171-175 abort guard,
src/parameters.hh:45 RESERVED).  The TPU analog asks the PJRT runtime
(`device.memory_stats()`) how much HBM is actually available, keeps a
reserve for batch arrays + XLA temporaries, and feeds the result into
the same two levers the pipeline already has:

  - db-axis width on a mesh (bucket ranges resident across chips), and
  - stream_parts (host->device bucket-range streaming, the swap-cycle
    analog) when even the per-device shard exceeds the budget.

An explicit --max-table-mb always wins; this module only fills in the
default so an oversized table streams instead of dying mid-classify
with a raw XLA OOM.
"""

from __future__ import annotations

# Reserve for batch buffers, results, and XLA scratch — the role of the
# reference's RESERVED = 300-400 MB per device (src/parameters.hh:45).
RESERVED_MB = 512.0

# When the runtime cannot report memory stats, fall back to the HBM of
# the device's GENERATION (device_kind substring -> MB), not a single
# worst-case number: a v5p without memory_stats must still plan a 4 GB
# table resident rather than stream it 8 ways.  CPU/unknown platforms
# return None (host memory, no practical table limit).
_TPU_GENERATION_MB = (
    # (device_kind substring, HBM MB per chip) — first match wins, so
    # the "lite" variants must precede their full-size siblings.
    ("v5 lite", 16384.0),    # v5e: 16 GB
    ("v5e", 16384.0),
    ("v5p", 95000.0),        # v5p: 95 GB
    ("v5", 95000.0),
    ("v6 lite", 32768.0),    # v6e (Trillium): 32 GB
    ("v6e", 32768.0),
    ("v4", 32768.0),         # v4: 32 GB
    ("v3", 16384.0),
    ("v2", 8192.0),
)
_TPU_FALLBACK_MB = 16384.0


def _generation_default_mb(device) -> float:
    kind = str(getattr(device, "device_kind", "")).lower()
    for sub, mb in _TPU_GENERATION_MB:
        if sub in kind:
            return mb
    return _TPU_FALLBACK_MB


def device_memory_budget_mb(device=None) -> float | None:
    """Usable MB for the resident DB table on one device.

    None means "unbounded / unknown-host" (CPU): keep the table
    resident.  TPU devices report memory stats via PJRT
    (bytes_reservable_limit preferred over bytes_limit: it excludes
    runtime-reserved regions); platforms that don't get their
    generation's HBM size from device_kind."""
    import os

    import jax

    override = os.environ.get("CUCLARK_DEVICE_MB")
    if override:  # operator override / test hook
        return float(override)
    if device is None:
        devs = jax.local_devices()
        if not devs:
            return None
        device = devs[0]
    platform = getattr(device, "platform", "cpu")
    if platform == "cpu":
        return None
    stats = None
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if stats:
        limit = stats.get("bytes_reservable_limit") or stats.get(
            "bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit:
            return max((limit - in_use) / 1e6 - RESERVED_MB, 64.0)
    return max(_generation_default_mb(device) * 0.9 - RESERVED_MB, 64.0)


def resolve_table_budget_mb(max_table_mb: float | None,
                            device=None) -> float | None:
    """Effective per-device table budget: the explicit flag if given,
    else the measured device budget (None = unbounded)."""
    if max_table_mb is not None:
        return max_table_mb
    return device_memory_budget_mb(device)


def plan_stream_parts(table_bytes: int, budget_mb: float | None,
                      num_db: int, nb: int) -> int:
    """Power-of-two host-streaming parts needed so each uploaded
    bucket-range part (already split num_db ways across the mesh) fits
    the per-device budget.  1 = fully resident."""
    parts = 1
    if budget_mb is None:
        return parts
    budget = budget_mb * 1e6
    while (table_bytes / num_db / parts > budget
           and parts * num_db < nb):
        parts *= 2
    return parts


def plan_db_axis(table_bytes: int, budget_mb: float | None,
                 max_devices: int) -> int:
    """Power-of-two db-axis width so each device's resident shard fits
    the budget (capped at the device count; streaming picks up the
    remainder)."""
    num_db = 1
    if budget_mb is None:
        return num_db
    budget = budget_mb * 1e6
    while table_bytes / num_db > budget and num_db * 2 <= max_devices:
        num_db *= 2
    return num_db
