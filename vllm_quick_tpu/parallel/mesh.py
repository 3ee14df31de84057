"""Device-mesh construction and the parallel execution context.

TPU-native replacement for the reference's process-group plumbing
(vllm/model_executor/parallel_utils/parallel_state.py:22-245): there are
no process groups to build — a ``jax.sharding.Mesh`` over (dp, ep, tp)
axes plus explicit collectives inside ``shard_map`` cover TP/EP, and
XLA routes them over ICI (intra-host) / DCN (inter-host) automatically.
"""
import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

_MESH: Optional[Mesh] = None

TP_AXIS = "tp"
DP_AXIS = "dp"
EP_AXIS = "ep"
SP_AXIS = "sp"
PP_AXIS = "pp"
AXIS_ORDER = (DP_AXIS, PP_AXIS, EP_AXIS, SP_AXIS, TP_AXIS)


def make_mesh(
    tensor_parallel_size: int = 1,
    data_parallel_size: int = 1,
    expert_parallel_size: int = 1,
    sequence_parallel_size: int = 1,
    pipeline_parallel_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build (and register) the global (dp, pp, ep, sp, tp) mesh.

    TP is the innermost axis so its collectives ride the fastest ICI
    links; SP (context parallelism: ring-attention prefill + partial
    paged decode, ops/ring_attention.py) sits just outside it so KV
    rotations stay on ICI; PP (stage pipeline, parallel/pipeline.py)
    exchanges only one activation tensor per microbatch tick so it
    tolerates slow links; DP is outermost so request-level parallelism
    crosses DCN.
    """
    global _MESH
    if devices is None:
        devices = jax.devices()
    world = (tensor_parallel_size * data_parallel_size *
             expert_parallel_size * sequence_parallel_size *
             pipeline_parallel_size)
    if world > len(devices):
        raise ValueError(
            f"Requested world size {world} exceeds available devices "
            f"({len(devices)}).")
    devs = np.asarray(devices[:world]).reshape(
        data_parallel_size, pipeline_parallel_size,
        expert_parallel_size, sequence_parallel_size,
        tensor_parallel_size)
    _MESH = Mesh(devs, AXIS_ORDER)
    return _MESH


def get_mesh() -> Mesh:
    global _MESH
    if _MESH is None:
        make_mesh()
    return _MESH


@dataclasses.dataclass(frozen=True)
class ParallelContext:
    """Static parallelism facts threaded through model code.

    Collective helpers are no-ops at world size 1, so the same model
    code runs single-chip and inside shard_map unchanged.
    """
    tp_size: int = 1
    dp_size: int = 1
    ep_size: int = 1
    sp_size: int = 1
    pp_size: int = 1
    tp_axis: str = TP_AXIS
    ep_axis: str = EP_AXIS
    sp_axis: str = SP_AXIS
    pp_axis: str = PP_AXIS

    def tp_all_reduce(self, x: jax.Array) -> jax.Array:
        """Sum-reduce across TP ranks (reference:
        communication_op.py:17-41 -> lax.psum over ICI)."""
        if self.tp_size == 1:
            return x
        return jax.lax.psum(x, self.tp_axis)

    def tp_all_gather(self, x: jax.Array, axis: int = -1) -> jax.Array:
        """Concatenate across TP ranks (communication_op.py:44)."""
        if self.tp_size == 1:
            return x
        if axis < 0:
            axis += x.ndim
        return jax.lax.all_gather(x, self.tp_axis, axis=axis, tiled=True)

    def tp_rank(self) -> jax.Array:
        if self.tp_size == 1:
            return jnp.int32(0)
        return jax.lax.axis_index(self.tp_axis)

    def moe_all_reduce(self, x: jax.Array) -> jax.Array:
        """Sum-reduce MoE partials across (ep, tp): ep ranks hold
        disjoint experts and tp ranks hold row-shards of each expert's
        down projection, so one psum over both axes combines them."""
        axes = []
        if self.ep_size > 1:
            axes.append(self.ep_axis)
        if self.tp_size > 1:
            axes.append(self.tp_axis)
        if not axes:
            return x
        return jax.lax.psum(x, tuple(axes))

    def ep_rank(self) -> jax.Array:
        if self.ep_size == 1:
            return jnp.int32(0)
        return jax.lax.axis_index(self.ep_axis)

    def sp_rank(self) -> jax.Array:
        if self.sp_size == 1:
            return jnp.int32(0)
        return jax.lax.axis_index(self.sp_axis)
