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

Usage: python _multihost_worker.py <pid> <nprocs> <port> <workdir>
"""

import os
import sys


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
