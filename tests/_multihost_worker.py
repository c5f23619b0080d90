"""Worker for the 2-process multi-host test (run via subprocess).

Each process joins a jax.distributed CPU cluster (4 virtual devices each
-> 8 global), then exercises the multi-host paths the reference drives
through torch.distributed.launch (full_shot/main/run.sh:3-11):

* per-process train-shard disjointness (data/samplers.shard_order)
* the streaming Trainer over the global 8-device mesh (GSPMD step with
  process-local batch shards assembled via make_array_from_process_local_data)
* process-sharded eval + cross-process metric combination
* host_allgather / allgather_ragged
* checkpointing through Orbax's collective save (primary-process write)

Usage: python _multihost_worker.py <pid> <nprocs> <port> <workdir> [mode]

Modes (VERDICT r3 #4 — multi-host preemption):
* (none)  — the original streaming-trainer suite
* pref    — uninterrupted 2-epoch Trainer.fit; rank 0 dumps final
            trainable leaves to <workdir>/ref.npz
* ppre    — same run, but rank 0 SIGTERMs ITSELF mid-epoch-0; the
            preemption OR-agreement makes BOTH processes checkpoint at
            the same dispatch boundary and raise PreemptedError
* pres    — same cluster relaunched: fit auto-resumes at the exact
            batch and finishes; rank 0 dumps <workdir>/res.npz
            (the test asserts ref == res bit-for-bit, globally)
"""

import os
import sys


def _preempt_main(pid, nprocs, workdir, mode):
    import signal

    import jax
    import numpy as np

    from peft_vit_tpu.config import get_default_config
    from peft_vit_tpu.engine.trainer import (
        PreemptedError,
        Trainer,
        _skip_batches,
        batch_iterator,
    )
    from peft_vit_tpu.models import ImageClassifier, VisionTransformer
    from peft_vit_tpu.parallel import make_mesh
    from peft_vit_tpu.peft import PEFTSpec, build_mask

    cfg = get_default_config()
    cfg.DATASET.DATASET = "synthetic"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 4  # per process -> global batch 8
    cfg.TRAIN.END_EPOCH = 2
    cfg.TRAIN.LR = 0.05
    cfg.TRAIN.LR_SCHEDULER.METHOD = "constant"
    cfg.TRAIN.CHECKPOINT_EVERY_STEPS = 100
    cfg.PRINT_FREQ = 1  # preemption agreement at every boundary
    cfg.OUTPUT_DIR = os.path.join(workdir, "preempt_out")

    # per-process LOCAL shard of the global batch: deterministic per rank,
    # identical across the three phases (the prefetcher assembles the
    # global array via make_array_from_process_local_data)
    rng = np.random.RandomState(100 + pid)
    y = np.arange(32) % 4
    x = rng.randn(32, 16, 16, 3).astype(np.float32) * 0.3
    x += np.linspace(-1, 1, 4)[y][:, None, None, None]

    mesh = make_mesh(data=jax.device_count())
    vit = VisionTransformer(
        image_size=16, patch_size=8, width=32, layers=2, heads=2,
        style="timm", spec=PEFTSpec(), use_flash=False,
    )
    model = ImageClassifier(backbone=vit, num_classes=4)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 3), np.float32)
    )["params"]
    mask = build_mask(params, "bitfit", num_layers=2)
    trainer = Trainer(
        cfg, model, params, mask, steps_per_epoch=8, mesh=mesh
    )
    ckpt = os.path.join(workdir, "preempt_ckpt")

    def batches(e, skip=None):
        it = batch_iterator(x, y, 4, seed=e)
        if skip:
            yield from _skip_batches(it, skip)
            return
        for j, b in enumerate(it):
            if mode == "ppre" and pid == 0 and e == 0 and j == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            yield b

    if mode == "pref":
        trainer.fit(batches, lambda: iter(()))
        if pid == 0:
            np.savez(
                os.path.join(workdir, "ref.npz"),
                *[np.asarray(l) for l in jax.tree_util.tree_leaves(
                    trainer.state.trainable)],
            )
    elif mode == "ppre":
        try:
            trainer.fit(batches, lambda: iter(()), checkpoint_dir=ckpt)
        except PreemptedError as e:
            print(f"MH_PREEMPTED rank {pid}: {e}", flush=True)
        else:
            raise AssertionError("expected PreemptedError on every rank")
    elif mode == "pres":
        trainer.fit(batches, lambda: iter(()), checkpoint_dir=ckpt)
        if pid == 0:
            np.savez(
                os.path.join(workdir, "res.npz"),
                *[np.asarray(l) for l in jax.tree_util.tree_leaves(
                    trainer.state.trainable)],
            )
    print(f"MH_PHASE_OK {mode} rank {pid}", flush=True)
    sys.stdout.flush()
    os._exit(0)


def main():
    pid, nprocs, port, workdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    from peft_vit_tpu.utils.dist import init_distributed, is_main_process

    rank, world = init_distributed(f"localhost:{port}", nprocs, pid)
    if len(sys.argv) > 5:
        _preempt_main(pid, nprocs, workdir, sys.argv[5])
        return
    import jax
    import numpy as np

    assert (rank, world) == (pid, nprocs), (rank, world)
    assert jax.device_count() == 4 * nprocs
    assert jax.local_device_count() == 4

    # --- shard disjointness across processes -----------------------------
    from peft_vit_tpu.data.samplers import default_order, shard_order
    from peft_vit_tpu.parallel.collectives import allgather_ragged, host_allgather

    order = default_order(47, epoch=0, seed=3)
    mine = shard_order(order, rank, world)
    allshards = allgather_ragged(np.sort(mine))  # ragged: 24 vs 23
    merged = sorted(np.asarray(allshards).reshape(-1).tolist())
    assert merged == list(range(47)), "shards must be disjoint + covering"

    # --- streaming trainer over the global mesh ---------------------------
    from peft_vit_tpu.commands.train import train_main
    from peft_vit_tpu.config import get_default_config

    tsv = os.path.join(workdir, "train.tsv")
    cfg = get_default_config()
    cfg.OUTPUT_DIR = os.path.join(workdir, "out")
    cfg.DATASET.DATASET = "mh"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.DATASET.ROOT = ""
    cfg.DATASET.TRAIN_TSV_LIST = [tsv]
    cfg.DATASET.TEST_TSV_LIST = [tsv]
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 1  # global batch 8 over the mesh
    cfg.TEST.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.EVAL_BEGIN_EPOCH = 0
    cfg.TRAIN.LR = 0.05
    cfg.TRAIN.LR_SCHEDULER.METHOD = "constant"
    cfg.MODEL.NAME = "clip_tiny"
    cfg.MODEL.SPEC.EMBED_DIM = 32
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    cfg.PEFT.METHOD = "full"
    cfg.TPU.STEPS_PER_DISPATCH = 2
    cfg.NAME = "mhrun"
    cfg.freeze()

    # eval is process-sharded: each host decodes only its stripe; with
    # 47 rows the stripes are ragged (24 vs 23) but must cover the set
    from peft_vit_tpu.data.streaming import StreamingSource

    src = StreamingSource(cfg, "test", normalize=False)
    n_local = sum(len(y) for _, y in src.batches())
    src.close()
    assert n_local in (47 // world, 47 // world + 1), (n_local, world)
    n_total = int(np.sum(host_allgather(np.asarray([n_local]))))
    assert n_total == 47, n_total

    # train batches must be in LOCKSTEP across processes (unequal counts
    # deadlock the global-collective train step): the min-stripe
    # truncation must equalize the ragged 24/23 shard
    src_tr = StreamingSource(
        cfg, "train", normalize=False, batch_multiplier=2
    )
    n_items = sum(1 for _ in src_tr.batches(0))
    src_tr.close()
    item_counts = host_allgather(np.asarray([n_items]))
    assert np.unique(np.asarray(item_counts)).size == 1, item_counts

    # ragged gather reassembles per-process shards in process order
    frag = np.full((rank + 1, 2), rank, np.float32)
    whole = allgather_ragged(frag)
    assert whole.shape == (sum(range(1, world + 1)), 2)
    assert (whole[: 1] == 0).all() and (whole[-world:] == world - 1).all()

    acc = train_main(cfg)
    assert np.isfinite(acc) and 0.0 <= acc <= 100.0, acc

    # Orbax wrote the checkpoint exactly once (primary process); the
    # index is the GLOBAL optimizer step (> 0 after a trained epoch),
    # and the stored record says epoch 0 completed
    ckpt = os.path.join(cfg.OUTPUT_DIR, "mh", "mhrun", "checkpoints")
    from peft_vit_tpu.engine.checkpoint import checkpoint_keys, latest_step

    step = latest_step(ckpt)
    assert step is not None and step > 0, step
    stored = checkpoint_keys(ckpt, step)
    assert stored is not None and {"epoch", "batch_in_epoch", "rng"} <= stored
    if is_main_process():
        print("MH_WORKER_OK", acc, flush=True)
    else:
        print("MH_WORKER_OK_RANK", rank, flush=True)
    sys.stdout.flush()
    os._exit(0)  # skip teardown (axon-free here, but exit fast regardless)


if __name__ == "__main__":
    main()
