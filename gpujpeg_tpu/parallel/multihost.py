"""Multi-host (multi-process) distributed encode.

SURVEY §2.3: the reference has no distributed backend at all (single
process, one GPU per coder). Here distribution is first-class:

* ``init_distributed`` wraps ``jax.distributed.initialize`` — one JAX
  process per host, all devices form one global platform.
* :class:`MultiHostEncoder` builds a global ``('frame', 'seg')`` mesh:
  the 'frame' axis spans processes (each host feeds and assembles its
  own frames — video sharding with zero cross-host pixel traffic), the
  'seg' axis spans each process's local devices (band sharding of each
  frame, as in :class:`ShardedEncoder`).
* For a single image spread across *all* hosts
  (:class:`MultiHostSingleImageEncoder`, bands across the whole mesh),
  per-segment bytes gather with ``multihost_utils.process_allgather``
  and every process assembles the identical stream (symmetric — no
  dedicated coordinator).

Every path is bit-identical to the single-chip encoder: bands/segments
are independent (DC prediction resets at every restart marker), so
distribution changes only WHERE segments are coded, never their bytes.

Validated by ``tests/test_multihost.py`` (2 CPU processes x 4 virtual
devices each, spawned subprocesses with a real coordinator) and by
``__graft_entry__.dryrun_multichip``.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..params import ImageParameters, Parameters
from .sharded import ShardedEncoder, plan_bands, split_raw_bands


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, relies on the cluster environment (TPU pods
    auto-discover); explicit arguments support manual/CPU clusters:
    ``init_distributed("host0:8476", num_processes=2, process_id=i)``.
    """
    kw = {}
    if coordinator_address is not None:
        kw = dict(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:  # already initialized is fine
        if "already" not in str(e):
            raise


def global_mesh(frame_axis_per_process: int = 1) -> Mesh:
    """Global ('frame', 'seg') mesh: 'frame' spans processes, 'seg' the
    devices within each process."""
    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    devs = np.empty((n_proc * frame_axis_per_process,
                     n_local // frame_axis_per_process), dtype=object)
    for d in jax.devices():
        # jax.devices() is ordered by process; keep each process's
        # devices in one 'frame' row so 'seg' collectives stay intra-host
        p = d.process_index
        li = _local_index(d)
        fr = p * frame_axis_per_process + li // (n_local //
                                                 frame_axis_per_process)
        devs[fr, li % (n_local // frame_axis_per_process)] = d
    return Mesh(devs, ("frame", "seg"))


def _local_index(d) -> int:
    locs = [x for x in jax.devices() if x.process_index == d.process_index]
    return locs.index(d)


class MultiHostEncoder:
    """Frame sharding across processes + band sharding across each
    process's local devices.

    ``encode_my_frames(frames, ...)`` — each process passes the frames it
    owns (``len(frames)`` equal on every process); returns that process's
    encoded streams. Pixel data never crosses hosts; the only global
    operation is the jitted shard_map itself.
    """

    def __init__(self, mesh: Mesh | None = None):
        self.mesh = mesh if mesh is not None else global_mesh()
        self._inner = ShardedEncoder(self.mesh)

    def encode_my_frames(self, frames, params: Parameters,
                         image: ImageParameters) -> list[bytes]:
        from jax.experimental import multihost_utils

        b = self._inner._build(params, image)
        layout = b.layout
        n_frame = self.mesh.shape["frame"]
        n_proc = jax.process_count()
        frames_per_proc = n_frame // n_proc
        if len(frames) > frames_per_proc:
            out = []
            for i in range(0, len(frames), frames_per_proc):
                out.extend(self.encode_my_frames(
                    frames[i:i + frames_per_proc], params, image))
            return out
        n_my = len(frames)
        pad = frames_per_proc - n_my
        local = np.stack([
            split_raw_bands(frames[min(i, n_my - 1)], image, layout)
            for i in range(frames_per_proc)
        ])  # (frames_per_proc, n_bands_total? -> bands of this frame)

        # global array: frame axis = n_frame across processes
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P("frame", "seg", None))
        global_shape = (n_frame,) + local.shape[1:]
        arrs = []
        local_j = jnp.asarray(local)
        seg_size = self.mesh.shape["seg"]
        bands_per_dev = local.shape[1] // seg_size
        dev_arrays, devs = [], []
        for fr in range(frames_per_proc):
            for si in range(seg_size):
                d = self.mesh.devices[jax.process_index() * frames_per_proc
                                      + fr, si]
                piece = local_j[fr, si * bands_per_dev:
                                (si + 1) * bands_per_dev][None]
                dev_arrays.append(jax.device_put(piece, d))
                devs.append(d)
        garr = jax.make_array_from_single_device_arrays(
            global_shape, sh, dev_arrays)

        rst_j = multihost_utils.broadcast_one_to_all(b.rst_np) \
            if n_proc > 1 else jnp.asarray(b.rst_np)
        has_j = multihost_utils.broadcast_one_to_all(b.has_np) \
            if n_proc > 1 else jnp.asarray(b.has_np)

        out, out_len, seg_bits, n_ff = b.fn1(garr, jnp.asarray(rst_j),
                                             jnp.asarray(has_j))
        # each process owns its frames' shards: gather only local data
        my = jax.process_index()
        results = []
        for fr in range(n_my):
            gf = my * frames_per_proc + fr
            out_f = _bytes_view(_local_frame(out, gf))
            len_f = _local_frame(out_len, gf)
            results.append(self._inner._assemble(
                layout, b.quant_zz, b.huff, out_f, len_f, params, image))
        return results


class MultiHostSingleImageEncoder:
    """One huge image's bands spread across every device of every host
    (the 'seg' axis spans the whole cluster); per-segment bytes gather
    with ``process_allgather`` and every process assembles the stream
    (symmetric, no dedicated coordinator)."""

    def __init__(self):
        n = len(jax.devices())
        devs = np.array(jax.devices()).reshape(1, n)
        self.mesh = Mesh(devs, ("frame", "seg"))
        self._inner = ShardedEncoder(self.mesh)

    def encode(self, raw, params: Parameters,
               image: ImageParameters) -> bytes:
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        b = self._inner._build(params, image)
        layout = b.layout
        n_bands = layout.n_bands
        bands = split_raw_bands(raw, image, layout)[None]  # (1, n_bands, L)

        sh = NamedSharding(self.mesh, P("frame", "seg", None))
        per_dev = n_bands // self.mesh.shape["seg"]
        dev_arrays = []
        for si, d in enumerate(self.mesh.devices[0]):
            if d.process_index != jax.process_index():
                continue
            piece = jnp.asarray(
                bands[:, si * per_dev:(si + 1) * per_dev])
            dev_arrays.append(jax.device_put(piece, d))
        garr = jax.make_array_from_single_device_arrays(
            bands.shape, sh, dev_arrays)

        out, out_len, seg_bits, n_ff = b.fn1(
            garr, jnp.asarray(b.rst_np), jnp.asarray(b.has_np))
        # gather this process's band shards, then allgather across hosts
        my_out = [np.asarray(s.data)[0] for s in sorted(
            out.addressable_shards, key=lambda s: s.index[1].start)]
        my_len = [np.asarray(s.data)[0] for s in sorted(
            out_len.addressable_shards, key=lambda s: s.index[1].start)]
        local_out = np.concatenate(my_out, axis=0)
        local_len = np.concatenate(my_len, axis=0)
        if jax.process_count() > 1:
            all_out = multihost_utils.process_allgather(local_out)
            all_len = multihost_utils.process_allgather(local_len)
            out_f = all_out.reshape(-1, *local_out.shape[1:])
            len_f = all_len.reshape(-1, *local_len.shape[1:])
        else:
            out_f, len_f = local_out, local_len
        return self._inner._assemble(layout, b.quant_zz, b.huff,
                                     _bytes_view(out_f), len_f,
                                     params, image)


class MultiHostDecoder:
    """Frame sharding across processes for decode: each process decodes
    the frames it owns on its own local devices (band sharding via
    :class:`ShardedDecoder`). Decode needs no cross-host collectives at
    all — APP13 segment info gives O(1) segment offsets
    (reference: gpujpeg_reader.c:1058-1126), so streams deal out to
    processes and each stream's bands to local chips."""

    def __init__(self, local_mesh: Mesh | None = None):
        from .sharded import ShardedDecoder
        if local_mesh is None:
            devs = np.array(jax.local_devices())
            local_mesh = Mesh(devs.reshape(1, -1), ("frame", "seg"))
        self._inner = ShardedDecoder(local_mesh)

    def decode_my_frames(self, streams) -> list:
        """``streams``: the JPEG byte streams this process owns. Returns
        ``[(raw, ImageParameters), ...]`` in the same order."""
        return [self._inner.decode(s) for s in streams]


def _bytes_view(a: np.ndarray) -> np.ndarray:
    """Pallas stuffing emits packed u32 words; view as bytes."""
    if a.dtype == np.uint32:
        return np.ascontiguousarray(a).view(np.uint8)
    return a


def _local_frame(garr, frame_idx: int) -> np.ndarray:
    """Materialize one frame's row of a ('frame','seg')-sharded global
    array from this process's addressable shards."""
    shards = [s for s in garr.addressable_shards
              if s.index[0].start <= frame_idx < s.index[0].stop]
    shards.sort(key=lambda s: s.index[1].start if isinstance(
        s.index[1], slice) else 0)
    parts = [np.asarray(s.data)[frame_idx - s.index[0].start]
             for s in shards]
    return np.concatenate(parts, axis=0)
