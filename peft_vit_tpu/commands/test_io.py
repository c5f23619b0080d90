"""Input-pipeline throughput benchmark (reference tools/test_io.py).

Synthesizes a TSV shard when --shards is not given, then measures the
native loader's decode+resize throughput (images/sec).
"""

from __future__ import annotations

import argparse
import base64
import io
import os
import tempfile
import time

import numpy as np


def synth_shard(n: int, hw: int = 256, path: str | None = None) -> str:
    from PIL import Image

    rng = np.random.RandomState(0)
    path = path or tempfile.mktemp(suffix=".tsv")
    with open(path, "w") as f:
        for i in range(n):
            arr = rng.randint(0, 255, (hw, hw, 3), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            b64 = base64.b64encode(buf.getvalue()).decode()
            f.write(f"img{i}\t{b64}\t{i % 10}\n")
    return path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shards", nargs="*", default=None)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    args = p.parse_args(argv)

    from ..data.native import NativeTsvLoader, native_available

    shards = args.shards or [synth_shard(args.n)]
    if not native_available():
        print("native runtime unavailable")
        return

    ld = NativeTsvLoader(
        shards,
        image_size=args.image_size,
        batch_size=args.batch,
        num_threads=args.threads,
    )
    n = len(ld)
    # warm epoch then timed epoch
    for _ in ld.epoch(0):
        pass
    t0 = time.perf_counter()
    total = 0
    for x, y, c in ld.epoch(1):
        total += c
    dt = time.perf_counter() - t0
    print(
        f"{total} images in {dt:.2f}s -> {total / dt:.1f} img/s "
        f"({args.threads} threads, {args.image_size}px)"
    )
    ld.close()


if __name__ == "__main__":
    main()
