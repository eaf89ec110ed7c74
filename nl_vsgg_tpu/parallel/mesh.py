"""Device mesh + sharding layout.

The reference has no parallelism at all (SURVEY.md §2.9): batch = 1 video on
one GPU. Here parallelism is a first-class design axis:

  * mesh ('data', 'model') over ICI — 'data' shards the video batch (the
    natural axis the reference lacks), 'model' shards wide Dense kernels.
  * The train step is a single jit: batch sharded P('data'), parameters
    replicated over 'data' and (for wide kernels) sharded over 'model'.
    XLA inserts the gradient all-reduce and the model-parallel collectives;
    there is no hand-written communication code (the TPU answer to the
    reference's absent NCCL/MPI layer).
  * Within a video, the temporal attention window is 2 frames
    (lib/transformer_wk.py:158-171), so if the frame axis ever needs
    sharding a 1-frame halo via ppermute suffices; at AG's scale
    (tens of frames) data parallelism dominates and the frame axis stays
    local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels at least this wide get their output dim sharded over 'model'.
_MODEL_SHARD_MIN_DIM = 1024


def make_mesh(data: int = -1, model: int = 1,
              devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (video-batch) axis over 'data'; everything else local."""
    return NamedSharding(mesh, P("data"))


def _param_spec(path: tuple, leaf: jnp.ndarray) -> P:
    """Model-parallel rule: shard the output dim of wide Dense kernels."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name == "kernel" and leaf.ndim == 2 and leaf.shape[-1] >= _MODEL_SHARD_MIN_DIM \
            and leaf.shape[-1] % 2 == 0:
        return P(None, "model")
    return P()


def param_shardings(mesh: Mesh, params) -> object:
    """NamedSharding pytree for a param tree (replicated over 'data')."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: params per rules, the rest replicated."""
    pspec = param_shardings(mesh, state.params)
    rep = replicated(mesh)

    def place(x, sh):
        return jax.device_put(x, sh)

    return state.replace(
        params=jax.tree.map(place, state.params, pspec),
        batch_stats=jax.tree.map(lambda x: place(x, rep), state.batch_stats),
        opt_state=jax.tree.map(lambda x: place(x, rep) if hasattr(x, "shape") else x,
                               state.opt_state),
        step=place(state.step, rep),
        skipped=place(state.skipped, rep),
    )


def shard_batch(mesh: Mesh, batch):
    """Place a stacked Entry batch with the leading axis over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim >= 1
                        else x, batch)
