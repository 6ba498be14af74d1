"""Post-hoc checkpoint diagnostics: the aliasing hunt.

Loads a stage checkpoint (accuracy.py --save-artifacts output), then in
float64 on CPU measures where the PDE residual actually lives: on the
uniform grids the optimizer/diagnostics see vs at RANDOM off-grid points,
plus layer weight norms and the error's θ-spectrum (does late training
manufacture frequencies the uniform grids cannot see?).

    python scripts/inspect_ckpt.py out/acc/dY_artifacts/params_stage_1.npz \
        annulus_laplace
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def main():
    ckpt_path, problem_name = sys.argv[1], sys.argv[2]
    from tpinn.app.serve import PINNServer
    from tpinn.core import deriv

    srv = PINNServer(ckpt_path, problem_name)
    problem, compiled, predictor = srv.problem, srv.compiled, srv.predictor
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        srv.params,
    )

    def walk(p, prefix=""):
        if isinstance(p, dict) and "layers" in p:
            for i, layer in enumerate(p["layers"]):
                w = np.asarray(layer["w"])
                print(f"  {prefix}layer{i}: |W|_max={np.abs(w).max():.3g} "
                      f"|W|_rms={np.sqrt((w**2).mean()):.3g}")
        elif isinstance(p, dict):
            for k, v in p.items():
                walk(v, prefix + k + "/")

    print("== weight norms ==")
    walk(params)

    lb = np.asarray(problem.lb)
    ub = np.asarray(problem.ub)
    f_u = lambda z: predictor(params, z)

    source_fn = None
    if getattr(problem, "source", None):
        from tpinn.core.pde import compile_coord_expr

        source_fn = compile_coord_expr(problem.source, problem.coords)

    def stats(tagname, z):
        f = np.asarray(compiled.residual(f_u, z)
                       - (source_fn(z) if source_fn else 0.0))
        u = np.asarray(f_u(z))
        ex = np.asarray(problem.exact(jnp.asarray(z)))
        err = u - ex
        print(f"  {tagname}: residual rms={np.sqrt((f**2).mean()):.3e} "
              f"max={np.abs(f).max():.3e} | err rms={np.sqrt((err**2).mean()):.3e} "
              f"max={np.abs(err).max():.3e}")

    print("== residual/error by point set (float64) ==")
    for g in (111, 334):
        ax = [np.linspace(lb[i], ub[i], g) for i in range(2)]
        A, B = np.meshgrid(ax[0], ax[1])
        zg = jnp.asarray(np.stack([A.ravel(), B.ravel()], 1))
        stats(f"uniform {g}^2", zg)
    rng = np.random.default_rng(0)
    zr = jnp.asarray(lb + rng.random((120000, 2)) * (ub - lb))
    stats("random 120k", zr)

    # θ-spectrum of the error at mid-radius (annulus) / mid-y otherwise
    mid = 0.5 * (lb[0] + ub[0])
    n = 4096
    t = np.linspace(lb[1], ub[1], n, endpoint=False)
    zt = jnp.asarray(np.stack([np.full(n, mid), t], 1))
    u = np.asarray(f_u(zt))[:, 0]
    ex = np.asarray(problem.exact(zt))[:, 0]
    spec = np.abs(np.fft.rfft(u - ex)) / n
    top = np.argsort(spec)[::-1][:8]
    print("== error θ-spectrum at mid first-coordinate (top modes) ==")
    for k in sorted(top):
        print(f"  mode {k}: amp {spec[k]:.3e}")


if __name__ == "__main__":
    main()
