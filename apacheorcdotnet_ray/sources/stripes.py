"""Read a directory of .oray stripe files back as a ray.data.Dataset.

One stripe = one independent unit of decode (the reference's stripes are
self-describing for the same reason, Stripes/StripeReader.cs:38-61), so
``read_binary_files`` + a stateless decode ``map_batches`` parallelizes
embarrassingly: each file decodes in its own task, streaming with backpressure.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

from ..stages.decode import StripeDecoder


def stripe_paths(stripe_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(stripe_dir, "*.oray")))


def read_stripes(stripe_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    paths = stripe_paths(stripe_dir)
    if not paths:
        raise FileNotFoundError(f"no .oray stripes under {stripe_dir}")
    ds = rd.read_binary_files(paths)
    decoder = StripeDecoder(columns=columns)  # stateless → plain-function task pool
    return ds.map_batches(
        decoder.__call__,
        batch_format="pyarrow",
        batch_size=None,  # one input file is already a full stripe
    )
