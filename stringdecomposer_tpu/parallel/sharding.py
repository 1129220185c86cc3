"""Data-parallel execution of the chain DP over a device mesh.

shard_map over a 1-D "data" mesh: the window batch (and per-window outputs)
are sharded on axis 0, the monomer tensor is replicated. Each device runs
the identical chain-DP program on its window shard — the TPU equivalent of
the reference's OpenMP loop over chunks (src/main.cpp:86-102), with no
cross-device communication at all (windows are independent by construction
of the halo chunking scheme, src/main.cpp:73-75).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 (check_vma superseded check_rep)
    from jax import shard_map as _shard_map

    def shard_map(f, **kw):
        kw["check_vma"] = kw.pop("check_rep", False)
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.chain_dp import chain_dp_forward
from .mesh import get_mesh


def make_sharded_forward(mesh: Mesh | None = None, inner_fn=None):
    """Returns a forward_fn with the chain_dp_forward signature that shards
    the window batch across the mesh. Pads the batch up to a multiple of the
    device count; padding windows are discarded by the caller (counts of
    padded rows are simply ignored since the caller slices by task list).

    `inner_fn` is the per-device chain-DP program: the fused Pallas kernel on
    real hardware, the lax.scan backend on CPU (same auto rule as the
    single-device pipeline)."""
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    if inner_fn is None:
        if jax.default_backend() == "cpu":
            inner_fn = chain_dp_forward
        else:
            from ..ops.chain_dp_pallas import chain_dp_forward_pallas

            inner_fn = chain_dp_forward_pallas

    def forward(windows, window_lens, mono, mono_lens, *, ins=-1, dele=-1,
                mismatch=-1, match=1, max_blocks=0):
        B = windows.shape[0]
        B_pad = (B + n_dev - 1) // n_dev * n_dev
        # per-window monomer tensors (the ed_thr route, rank 3) shard on the
        # window axis alongside the windows; the shared rank-2 tensor
        # replicates
        per_window = getattr(mono, "ndim", 2) == 3
        if B_pad != B:
            pad = B_pad - B
            windows = np.concatenate([windows, np.repeat(windows[-1:], pad, axis=0)])
            window_lens = np.concatenate([window_lens, np.repeat(window_lens[-1:], pad)])
            if per_window:
                import jax.numpy as jnp

                mono = jnp.concatenate([mono, jnp.repeat(mono[-1:], pad, axis=0)])
                mono_lens = jnp.concatenate(
                    [mono_lens, jnp.repeat(mono_lens[-1:], pad, axis=0)]
                )

        inner = partial(
            inner_fn,
            ins=ins, dele=dele, mismatch=mismatch, match=match,
            max_blocks=max_blocks or windows.shape[1],
        )
        mono_spec = P("data", None, None) if per_window else P(None, None)
        lens_spec = P("data", None) if per_window else P(None)
        sharded = shard_map(
            inner,
            mesh=mesh,
            in_specs=(P("data", None), P("data"), mono_spec, lens_spec),
            out_specs=(P("data", None, None), P("data")),
            check_rep=False,
        )
        blocks, counts = jax.jit(sharded)(windows, window_lens, mono, mono_lens)
        return blocks[:B], counts[:B]

    return forward
