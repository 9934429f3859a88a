"""Measure device->host fetch bandwidth through the axon tunnel.

Decides the design for streaming full-compartment SEIP saves (VERDICT r3 #3):
if fetch bandwidth >> solve throughput's save-production rate, chunked
host-offload streaming can hide behind compute; if not, the streaming driver
is fetch-bound and the bench must say so.
"""
import sys, time
import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

for mb in (16, 128, 512, 1024):
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32) * 1.000001
    x.block_until_ready()
    # warm
    _ = np.asarray(x[:1024])
    t0 = time.perf_counter()
    h = jax.device_get(x)
    t1 = time.perf_counter()
    print(f"device_get {mb:5d} MB: {t1-t0:7.3f} s  -> {mb/(t1-t0):8.1f} MB/s  (checksum {float(h[:8].sum()):.4f})")
    del x, h

# host->device for completeness
for mb in (128,):
    n = mb * 1024 * 1024 // 4
    h = np.ones((n,), np.float32)
    t0 = time.perf_counter()
    x = jax.device_put(h)
    x.block_until_ready()
    t1 = time.perf_counter()
    print(f"device_put {mb:5d} MB: {t1-t0:7.3f} s  -> {mb/(t1-t0):8.1f} MB/s")

# overlapped: does copy_to_host_async let a fetch overlap compute?
a = jnp.ones((256 * 1024 * 1024 // 4,), jnp.float32)  # 256 MB
a.block_until_ready()

@jax.jit
def burn(y):
    def body(i, y):
        return y * 1.0000001 + 1e-9
    return jax.lax.fori_loop(0, 2000, body, y)

b = burn(a); b.block_until_ready()  # compile
t0 = time.perf_counter()
b = burn(a); b.block_until_ready()
t_burn = time.perf_counter() - t0
t0 = time.perf_counter()
a.copy_to_host_async()
b = burn(a)
h = jax.device_get(a)
b.block_until_ready()
t_both = time.perf_counter() - t0
t0 = time.perf_counter()
h2 = jax.device_get(a)
t_fetch = time.perf_counter() - t0
print(f"burn {t_burn:.3f}s fetch256MB {t_fetch:.3f}s overlapped(both) {t_both:.3f}s")
