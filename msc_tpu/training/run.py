"""Training CLI: fine-tune the VLM on pipeline-generated captions.

End-to-end demonstration of the training subsystem: synthesizes a
(images, caption) dataset by running the analytic pipeline over mock
scenes, tokenizes the structured captions, and fine-tunes the VLM with
the sharded train step.  With a real dataset + the `vlm` backend this is
the self-distillation loop that closes the quality gap (SURVEY.md hard
part #2).

Usage:
    python -m msc_tpu.training.run [--steps 20] [--preset msc-vlm-tiny]
                                   [--mesh-data N --mesh-model M]
"""

from __future__ import annotations

import argparse
import json


def build_dataset(num_scenes: int, cfg, tokenizer, max_len: int):
    """(images, ids, loss_mask) batches from analytic pipeline captions."""
    import numpy as np

    from msc_tpu.data.nuscenes import MockNuScenesLoader
    from msc_tpu.models.tokenizer import BOS_ID, EOS_ID, PAD_ID, USER_ID, ASSISTANT_ID
    from msc_tpu.pipeline import SemanticCaptioningPipeline
    from msc_tpu.serving.analytic import AnalyticBackend

    loader = MockNuScenesLoader(num_scenes=num_scenes, samples_per_scene=1)
    pipeline = SemanticCaptioningPipeline(backend=AnalyticBackend(),
                                          verbose=False)
    images, ids_list, masks = [], [], []
    for i in range(num_scenes):
        sample = loader.get_sample_by_scene_index(i, 0)
        result = pipeline.process_scene(
            images=sample["images"], camera_names=sample["camera_names"],
            point_cloud=sample["point_cloud"],
            annotations=sample["annotations"])
        caption = json.dumps(result["structured_caption"])[: max_len // 2]
        prompt = [BOS_ID, USER_ID] + tokenizer.encode("caption this scene:")
        target = tokenizer.encode(caption) + [EOS_ID]
        seq = (prompt + [ASSISTANT_ID] + target)[:max_len]
        mask = [0] * min(len(prompt) + 1, len(seq))
        mask += [1] * (len(seq) - len(mask))
        ids = np.full(max_len, PAD_ID, np.int32)
        ids[: len(seq)] = seq
        m = np.zeros(max_len, bool)
        m[: len(mask)] = mask
        ids_list.append(ids)
        masks.append(m)
        img = sample["images"][0][::8, ::8]  # cheap downsample for demo
        images.append(img)
    return np.stack(images), np.stack(ids_list), np.stack(masks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--preset", default="msc-vlm-tiny")
    ap.add_argument("--mesh-data", type=int, default=1)
    ap.add_argument("--mesh-model", type=int, default=1)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--save", default=None, help="checkpoint dir")
    args = ap.parse_args()

    from msc_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msc_tpu.config import vlm_preset
    from msc_tpu.models.bpe import make_tokenizer
    from msc_tpu.models.vlm import init_vlm_params
    from msc_tpu.ops.image import preprocess_images
    from msc_tpu.parallel.mesh import data_sharding, make_mesh, shard_params
    from msc_tpu.training.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    cfg = vlm_preset(args.preset)
    tokenizer = make_tokenizer(cfg)  # MUST match the serving tokenizer
    max_len = min(cfg.max_seq_len, 256)

    print(f"building dataset from {args.scenes} mock scenes...")
    raw_images, ids, loss_mask = build_dataset(args.scenes, cfg, tokenizer,
                                               max_len)
    images = preprocess_images(jnp.asarray(raw_images), size=cfg.image_size)

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    mesh = None
    if args.mesh_data * args.mesh_model > 1:
        mesh = make_mesh(args.mesh_data, args.mesh_model,
                         jax.devices()[: args.mesh_data * args.mesh_model])
        params = shard_params(params, mesh)
    optimizer = make_optimizer(lr=args.lr)
    state = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer, mesh=mesh)

    ids = jnp.asarray(ids)
    loss_mask = jnp.asarray(loss_mask)
    if mesh is not None:
        dsh = data_sharding(mesh)
        ids = jax.device_put(ids, dsh)
        loss_mask = jax.device_put(loss_mask, dsh)
        images = jax.device_put(images, dsh)

    losses = []
    for step in range(args.steps):
        state, loss = step_fn(state, ids, images, loss_mask)
        losses.append(float(loss))
        if step % max(1, args.steps // 10) == 0 or step == args.steps - 1:
            print(f"step {step:4d}  loss {losses[-1]:.4f}")
    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"({'improved' if losses[-1] < losses[0] else 'NOT improved'})")

    if args.save:
        from msc_tpu.utils.checkpoint import save_params

        save_params(args.save, jax.device_get(state.params))
        print(f"checkpoint -> {args.save}")


if __name__ == "__main__":
    main()
