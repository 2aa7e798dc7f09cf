"""Multi-PROCESS dryrun child: one sharded train step across a process
boundary (SURVEY.md §2.3 item 7 — the `jax.distributed` DCN seam).

Launched (twice) by ``__graft_entry__.dryrun_multichip``: each process
hosts 4 virtual CPU devices; ``make_multihost_mesh(model=2)`` builds the
global (data=4, model=2) mesh with the data axis spanning the process
boundary (DCN placement) and the TP axis inside each process (ICI
placement).  One real train step runs through it — the gradient mean
over ``data`` is the cross-process collective under test.

Env contract (set by the parent): MSC_COORDINATOR=host:port,
MSC_NUM_PROCESSES, MSC_PROCESS_ID, MSC_PLATFORM=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4.
"""

from __future__ import annotations

import os
import sys


def _tiny_cfg():
    from msc_tpu.config import VLMConfig

    return VLMConfig(
        image_size=28, patch_size=14, vit_width=64, vit_depth=2, vit_heads=4,
        vocab_size=512, d_model=128, n_layers=2, n_heads=8, n_kv_heads=2,
        head_dim=16, mlp_hidden=256, max_seq_len=256, page_size=16,
        dtype="float32", tokenizer="byte",
    )


def main() -> int:
    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()  # runs init_distributed() first (env-gated)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msc_tpu.models.tokenizer import PAD_ID
    from msc_tpu.models.vlm import init_vlm_params
    from msc_tpu.parallel.mesh import data_sharding, make_multihost_mesh, \
        shard_params
    from msc_tpu.training.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    want_procs = int(os.environ.get("MSC_NUM_PROCESSES", "1"))
    assert jax.process_count() == want_procs, (
        f"process_count {jax.process_count()} != {want_procs}")
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == want_procs * n_local, (n_global, n_local)

    mesh = make_multihost_mesh(model=2)
    # the data axis must straddle the process boundary for this dryrun to
    # exercise DCN at all
    procs_in_mesh = {d.process_index for d in mesh.devices.flat}
    assert len(procs_in_mesh) == want_procs, procs_in_mesh
    # ...and no TP (model-axis) group may cross a process boundary
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            "TP group crosses a host boundary (ICI axis misplaced)")

    cfg = _tiny_cfg()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    optimizer = make_optimizer()
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer, mesh=mesh)

    data = mesh.devices.shape[0]
    B, T = 2 * data, 64
    rng = np.random.default_rng(0)  # same on both processes
    ids = np.asarray(rng.integers(32, 120, size=(B, T)), np.int32)
    ids[:, -8:] = PAD_ID
    mask = ids != PAD_ID

    dsh = data_sharding(mesh)
    # per-process local shards -> one global array (the multi-host input
    # path real sweeps use)
    rows_per_proc = B // want_procs
    lo = jax.process_index() * rows_per_proc
    ids_g = jax.make_array_from_process_local_data(
        dsh, ids[lo: lo + rows_per_proc], global_shape=(B, T))
    mask_g = jax.make_array_from_process_local_data(
        dsh, mask[lo: lo + rows_per_proc], global_shape=(B, T))

    state, loss = step_fn(state, ids_g, None, mask_g)
    loss_val = float(loss)  # replicated output: every process agrees
    assert np.isfinite(loss_val), loss_val
    if jax.process_index() == 0:
        print(f"multiproc child: {want_procs} procs x {n_local} devices, "
              f"mesh={mesh.devices.shape}, loss={loss_val:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
