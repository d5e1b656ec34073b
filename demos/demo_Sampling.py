"""Sampling demo — NUTS/HMC/SMC over GP hyperparameters + diagnostics
(north-star extensions; no reference counterpart)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pygps_tpu as pg                    # noqa: E402
from pygps_tpu.inference.diagnostics import ess, split_rhat  # noqa: E402
from data import regression_1d            # noqa: E402


def main():
    import jax.numpy as jnp

    x, y, xs = regression_1d(n=30, seed=5)
    m = pg.GPR()
    m.setData(x, y)

    samples, stats = m.sample(num_samples=150, num_warmup=150,
                              num_chains=4, sampler="nuts", seed=0)
    s = np.asarray(samples)
    rhat = np.asarray(split_rhat(jnp.asarray(s)))
    e = np.asarray(ess(jnp.asarray(s)))
    names = ["log_ell", "log_sf", "log_sn"]
    for i, nm in enumerate(names):
        print(f"[NUTS] {nm}: mean={s[:, :, i].mean():+.3f} "
              f"sd={s[:, :, i].std():.3f} R-hat={rhat[i]:.3f} "
              f"ESS={e[i]:.0f}")
    assert np.all(rhat < 1.2)
    print(f"[NUTS] accept={float(np.asarray(stats['accept_prob']).mean()):.2f} "
          f"step_size={float(stats['step_size']):.3f}")

    # posterior-predictive from hyperparameter draws (thin to 20)
    thin = s.reshape(-1, 3)[::30]
    preds = []
    for th in thin:
        m.covfunc.hyp = list(th[:2])
        m.likfunc.hyp = [float(th[2])]
        m.posterior = None
        preds.append(m.predict(xs)[2][:, 0])
    spread = np.std(np.stack(preds), axis=0).mean()
    print(f"[NUTS] mean hyper-predictive spread = {spread:.4f}")


if __name__ == "__main__":
    main()
