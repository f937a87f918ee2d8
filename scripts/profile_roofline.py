"""Establish the real chip roofline through the axon tunnel: streaming
bandwidth, elementwise throughput, matmul shapes, scan iteration cost."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_inprog(name, make_fn, *args, length=10, unit_bytes=0, unit_flops=0):
    fn = jax.jit(make_fn(length))
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    t0 = time.perf_counter()
    jax.device_get(jax.tree.leaves(fn(*args))[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / length
    extra = ""
    if unit_bytes:
        extra += f"  {unit_bytes/dt/1e9:7.1f} GB/s"
    if unit_flops:
        extra += f"  {unit_flops/dt/1e12:6.1f} TFLOP/s"
    print(f"{name:46s} {dt*1e3:8.3f} ms{extra}", flush=True)


def main():
    n = 1 << 25  # 32M f32 = 128 MB
    x = jnp.ones((n,), jnp.float32)

    def ew(length):
        def f(x):
            def body(c, _):
                return c * 1.000001 + 1.0, None
            return jax.lax.scan(body, x, None, length=length)[0]
        return f

    bench_inprog("elementwise fma 128MB (r+w 256MB)", ew, x, unit_bytes=256e6)

    x2 = jnp.ones((1 << 22,), jnp.float32)  # 16 MB
    bench_inprog("elementwise fma 16MB (r+w 32MB)", ew, x2, unit_bytes=32e6)

    def red(length):
        def f(x):
            def body(c, _):
                return c + jnp.sum(x) * 1e-9, None
            return jax.lax.scan(body, jnp.float32(0), None, length=length)[0]
        return f

    bench_inprog("sum-reduce 128MB", red, x, unit_bytes=128e6)

    for mnk, dt_ in ((2048, jnp.bfloat16), (4096, jnp.bfloat16), (8192, jnp.bfloat16), (4096, jnp.float32)):
        a = jnp.ones((mnk, mnk), dt_)

        def mm(length):
            def f(a):
                def body(c, _):
                    return jnp.dot(c, a, preferred_element_type=dt_), None
                return jax.lax.scan(body, a, None, length=length)[0]
            return f

        bench_inprog(f"matmul {mnk}^3 {dt_.__name__}", mm, a, unit_flops=2 * mnk**3)

    # conv2d (segmentation / FAST detector shape)
    img = jnp.ones((1, 480, 640, 32), jnp.bfloat16)
    w = jnp.ones((3, 3, 32, 32), jnp.bfloat16)

    def cv(length):
        def f(img, w):
            def body(c, _):
                return jax.lax.conv_general_dilated(
                    c, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16,
                ), None
            return jax.lax.scan(body, img, None, length=length)[0]
        return f

    bench_inprog(
        "conv3x3 480x640x32->32 bf16", cv, img, w,
        unit_flops=2 * 480 * 640 * 32 * 32 * 9,
    )

    # scan-iteration floor: empty-ish body on tiny state
    t = jnp.ones((8, 128), jnp.float32)
    bench_inprog("tiny scan body floor", ew, t, length=200)

    # one-hot matmul resolve (the integrate pattern):
    # [V,512,24]x[V,24,144] einsum at V=2048
    V = 2048
    oh = jnp.ones((V, 512, 24), jnp.bfloat16)
    patch = jnp.ones((V, 24, 24 * 6), jnp.bfloat16)

    def ohmm(length):
        def f(oh, patch):
            def body(c, _):
                r = jnp.einsum("vsp,vpq->vsq", oh, patch,
                               preferred_element_type=jnp.float32)
                return c + jnp.float32(r[0, 0, 0]) * 0, None
            return jax.lax.scan(body, jnp.float32(0), None, length=length)[0]
        return f

    bench_inprog(
        f"einsum [V,512,24]x[V,24,144] V={V} bf16", ohmm, oh, patch,
        unit_flops=2 * V * 512 * 24 * 144,
    )


if __name__ == "__main__":
    main()
