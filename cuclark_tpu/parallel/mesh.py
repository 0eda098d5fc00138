"""Multi-chip execution: DB sharding + data parallelism over a mesh.

Replaces the reference's entire multi-GPU machinery — DB part planning
(src/CuClarkDB.cu:540-574), part swap cycles (:813-858), in-device and
cross-device cudaMemcpyPeer merge trees (:929-994), pinned-host partial
round-trips — with one jitted SPMD program over a 2-D device mesh:

  axis "db":   hash-table bucket rows range-sharded; each shard probes
               only the buckets it owns (mask, not control flow) and the
               per-window labels merge with a single psum over ICI.
               A k-mer hits in at most one shard (keys are unique), so
               summing label integers is an exact merge.
  axis "data": read batches sharded; results stay sharded for per-host
               CSV writing.

When the DB fits aggregate HBM (36 GB over any v5p slice) there are no
swap cycles at all; host-streaming of bucket ranges remains the
fallback for DB >> HBM (the C8 analog) by looping this same program
over range loads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cuclark_tpu import codec, score
from cuclark_tpu.hashdb import KmerDB
from cuclark_tpu.probe import probe


def make_mesh(num_db: int, num_data: int | None = None, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if num_data is None:
        if total % num_db:
            raise ValueError(f"{total} devices not divisible by db={num_db}")
        num_data = total // num_db
    return Mesh(devices.reshape(num_data, num_db), axis_names=("data", "db"))


def shard_db_table(db: KmerDB, mesh: Mesh):
    """Place the table on the mesh, bucket rows sharded along 'db',
    replicated along 'data'. Returns a device array."""
    num_db = mesh.shape["db"]
    if db.nb % num_db:
        raise ValueError(f"bucket count {db.nb} not divisible by db={num_db}")
    sharding = NamedSharding(mesh, P("db", None))
    return jax.device_put(db.table, sharding)


def build_sharded_classify(mesh: Mesh, *, k: int, nb_bits: int, slots: int,
                           num_choices: int, nb_total: int):
    """Returns a jitted fn (table, packed2, vbits) -> (results [R,5],
    labels [R,P]) with table sharded on 'db' and reads/results sharded
    on 'data'.  Reads arrive in the 2-bit wire format (codec.pack_codes)
    and unpack on-chip — host->chip bytes are the scarce resource, as in
    the reference's u16 read containers (src/CuCLARK_hh.hh:1630-1716)."""
    num_db = mesh.shape["db"]
    nb_local = nb_total // num_db

    def local_step(table, packed2, vbits):
        # packed2: [R_local, L/4]; vbits: [R_local, L/8]; table: [nb_local, 3S]
        codes = codec.unpack_codes(packed2, vbits)
        (khi, klo), valid = codec.extract_kmers(codes, k)
        chi, clo = codec.canonical((khi, klo), k)
        start = jax.lax.axis_index("db").astype(jnp.int32) * nb_local
        labels = probe(table, nb_bits, slots, num_choices, chi, clo,
                       bucket_start=start, nb_local=nb_local)
        labels = jnp.where(valid, labels, 0)
        # exact merge: every k-mer matches in at most one db shard
        labels = jax.lax.psum(labels, "db")
        return score.score_labels(labels), labels

    shardd = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("db", None), P("data", None), P("data", None)),
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )
    return jax.jit(shardd)


class ShardedClassifier:
    """Mesh-parallel version of pipeline.Classifier's device step."""

    def __init__(self, db: KmerDB, mesh: Mesh):
        self.db = db
        self.mesh = mesh
        self.table = shard_db_table(db, mesh)
        self._step = build_sharded_classify(
            mesh,
            k=db.k,
            nb_bits=db.nb_bits,
            slots=db.slots,
            num_choices=db.num_choices,
            nb_total=db.nb,
        )
        self._codes_sharding = NamedSharding(mesh, P("data", None))

    def classify_codes(self, codes: np.ndarray):
        """codes: [R, L] uint8, R divisible by the data axis size."""
        num_data = self.mesh.shape["data"]
        R = codes.shape[0]
        if R % num_data:
            pad = num_data - R % num_data
            codes = np.pad(codes, ((0, pad), (0, 0)),
                           constant_values=codec.INVALID)
        packed2, vbits = codec.pack_codes(codes)
        dev_p2 = jax.device_put(packed2, self._codes_sharding)
        dev_vb = jax.device_put(vbits, self._codes_sharding)
        results, labels = self._step(self.table, dev_p2, dev_vb)
        return np.asarray(results)[:R], np.asarray(labels)[:R]
