"""Delta-timed advect probe on the saved driven 2048^2 field.

Usage: python scripts/advect_probe.py [module_path] (from the repo root;
expects a driven 2048^2 field at /tmp/vf/big.npz — generate with
`python -m cudafluidsimulation_tpu.cli --grid 2048 --steps 300 --impulse orbit
 --save-fields /tmp/vf/big.npz`)
Times a jitted lax.scan of the advect op (two scan lengths, subtracted) so
tunnel dispatch latency cancels; sync via host transfer of a reduced scalar.
If module_path is given, imports that file as the advect module instead of
the repo's ops.advect_pallas.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

if len(sys.argv) > 1:
    import importlib.util
    spec = importlib.util.spec_from_file_location("advect_v2", sys.argv[1])
    ap = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ap)
else:
    from cudafluidsimulation_tpu.ops import advect_pallas as ap

z = np.load("/tmp/vf/big.npz")
u = jnp.asarray(z["u"])
v = jnp.asarray(z["v"])
dt = 1.0 / 60.0


def make(n):
    @jax.jit
    def run(f0, uu, vv):
        def body(f, _):
            y = ap.advect(f, uu, vv, dt, 1.2, "field", 15)
            return f0 + 1e-30 * y, None
        f, _ = jax.lax.scan(body, f0, None, length=n)
        return jnp.sum(f)
    return run


def t(fn, *args):
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


short, long_ = make(4), make(20)
for label, scale in (("driven", 1.0), ("quiet", 0.01)):
    uu, vv = u * scale, v * scale
    f0 = jnp.stack([uu, vv])
    float(short(f0, uu, vv)); float(long_(f0, uu, vv))  # compile
    ms = (t(long_, f0, uu, vv) - t(short, f0, uu, vv)) / 16 * 1e3
    print(f"advect_velocity 2048^2 {label}: {ms:.3f} ms/call")
