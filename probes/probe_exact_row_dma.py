"""Can the save DMA write exact (non-8-padded) row counts to HBM?

The generic kernel pads save rows to 8 sublanes (s_pad) and slices the
padded HBM buffer after the kernel -- a ~1.33x buffer inflation plus a
full-buffer copy that together cost ~1.7x HBM footprint at max width.
If Mosaic accepts a DMA of scratch[:n_save] (6 rows) into an exact
(n_saves, 6, B) buffer, the padding copy disappears and max width rises.

Usage: python probes/probe_exact_row_dma.py  (TPU)
"""

import sys

import _bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(y_ref, out_ref, scratch, sem, *, n_save, n_saves):
    i = pl.program_id(0)
    block_b = scratch.shape[1]

    def _dma(slot):
        return pltpu.make_async_copy(
            scratch,
            out_ref.at[slot, :, pl.ds(i * block_b, block_b)],
            sem,
        )

    def body(slot, y):
        y = y + 1.0
        for j in range(n_save):
            scratch[j, :] = y[j, :].astype(scratch.dtype)
        _dma(slot).start()
        _dma(slot).wait()
        return y

    jax.lax.fori_loop(0, n_saves, body, y_ref[...])


def main():
    B, R, n_save, n_saves, block_b = 1024, 8, 6, 5, 512
    y = jnp.arange(R * B, dtype=jnp.float32).reshape(R, B) / (R * B)
    out = pl.pallas_call(
        lambda yr, o, s, m: kernel(yr, o, s, m, n_save=n_save, n_saves=n_saves),
        out_shape=jax.ShapeDtypeStruct((n_saves, n_save, B), jnp.bfloat16),
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((R, block_b), lambda i: (0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((6, block_b), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(y)
    expect = np.stack(
        [np.asarray(y)[:n_save] + (k + 1) for k in range(n_saves)]
    ).astype(jnp.bfloat16)
    got = np.asarray(out)
    err = np.max(np.abs(got.astype(np.float32) - expect.astype(np.float32)))
    print(f"[exact_row_dma] max abs err {err:.2e}", file=sys.stderr)
    assert err == 0.0, "exact-row DMA mismatch"
    print("[exact_row_dma] OK: 6-row DMA into exact (T,6,B) buffer works",
          file=sys.stderr)


if __name__ == "__main__":
    main()
