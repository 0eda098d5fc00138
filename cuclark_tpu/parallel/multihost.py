"""Multi-host execution: per-host input sharding + global mesh.

The reference is single-node multi-GPU only (SURVEY §5); this module is
the scale-out path it lacks.  Design (How-to-Scale-Your-Model recipe):

 - a global 2-D mesh ("data" over hosts x local chips, "db" within or
   across hosts depending on DB size vs per-host HBM), built from
   jax.devices() after jax.distributed.initialize();
 - each host reads only its byte range of the input file and scans
   forward to the first record boundary (the reference's OpenMP
   byte-range scan, src/CuCLARK_hh.hh:1339-1471, applied across hosts
   over DCN instead of threads);
 - each host packs and feeds only its local shard of every global batch
   (jax.make_array_from_process_local_data), the jitted sharded step
   runs collectives over ICI/DCN, and each host writes its own ordered
   CSV shard (concatenated by rank order afterwards).

Everything here except `initialize()` is pure logic and unit-tested on
a single process; the mesh/step reuse cuclark_tpu.parallel.mesh.
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed bring-up (no-op when single-process)."""
    import jax

    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_byte_range(file_size: int, num_hosts: int, host_id: int):
    """Even byte split; the scan then aligns each start to a record."""
    per = file_size // num_hosts
    start = per * host_id
    end = file_size if host_id == num_hosts - 1 else per * (host_id + 1)
    return start, end


def align_to_fasta_record(buf: np.ndarray, offset: int) -> int:
    """Scan forward from offset to the next '>' at a line start
    (reference FASTA batch split, src/CuCLARK_hh.hh:1363-1365)."""
    n = len(buf)
    if offset == 0:
        return 0
    i = offset
    while i < n:
        if buf[i] == ord(">") and buf[i - 1] == ord("\n"):
            return i
        i += 1
    return n


def align_to_fastq_record(buf: np.ndarray, offset: int) -> int:
    """Scan forward from offset to the next FASTQ record start using the
    reference's lookahead heuristic (src/CuCLARK_hh.hh:1405-1471): among
    upcoming newline-following lines, a line starting with '@' whose
    line-after-next starts with '+' is a record header (quality lines
    may also start with '@', but never two rows before a '+')."""
    n = len(buf)
    if offset == 0:
        return 0
    # positions of the next several line starts
    i = offset
    # move to the next line start
    while i < n and buf[i - 1] != ord("\n"):
        i += 1
    starts = []
    j = i
    while j < n and len(starts) < 8:
        starts.append(j)
        while j < n and buf[j] != ord("\n"):
            j += 1
        j += 1
    for idx, s in enumerate(starts):
        if buf[s] == ord("@"):
            if idx + 2 < len(starts) and buf[starts[idx + 2]] == ord("+"):
                return s
            if idx + 2 >= len(starts):  # near EOF
                return s
    return n


def host_record_slice(buf: np.ndarray, num_hosts: int, host_id: int):
    """The [start, end) byte range of records owned by this host."""
    fmt_fastq = len(buf) > 0 and buf[0] == ord("@")
    align = align_to_fastq_record if fmt_fastq else align_to_fasta_record
    s0, e0 = host_byte_range(len(buf), num_hosts, host_id)
    start = align(buf, s0)
    end = align(buf, e0) if e0 < len(buf) else len(buf)
    return start, end


def shard_reads_for_host(buf: np.ndarray, num_hosts: int, host_id: int):
    """Scan only this host's record slice.

    Returns (name_s, name_e, seq_s, seq_e) absolute offsets into buf."""
    from cuclark_tpu.io import fast_parse

    start, end = host_record_slice(buf, num_hosts, host_id)
    if start >= end:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    sub = buf[start:end]
    ns, ne, ss, se = fast_parse.scan_file(sub)
    return ns + start, ne + start, ss + start, se + start
