"""At-scale fine-tune validation: the full published phase-2 schedule on
physically-generated fake brains, end-to-end through the Trainer.

Builds 6 subjects of 64x64x8 ASE volumes from smooth (OEF, DBV) maps via
the forward model (+ noise + elliptical brain mask), pretrains
(streaming), fine-tunes with the MC-ELBO, then checks posterior maps
against the generating parameters inside the mask.

    python benchmarks/validate_finetune.py [--ft-epochs N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_subjects(scan, n=6, x=64, y=64, z=8, seed=0):
    import jax.numpy as jnp

    from qbold_vi_tpu.ops import physics

    rng = np.random.default_rng(seed)
    # smooth parameter maps: low-freq random fields
    def smooth_field(lo, hi):
        coarse = rng.uniform(0, 1, size=(n, 8, 8, 4))
        f = np.stack([np.kron(c, np.ones((x // 8, y // 8, z // 4)))
                      for c in coarse])
        return (lo + (hi - lo) * f).astype(np.float32)

    oef = smooth_field(0.2, 0.6)
    dbv = smooth_field(0.01, 0.12)
    xx, yy = np.meshgrid(np.linspace(-1, 1, x), np.linspace(-1, 1, y),
                         indexing="ij")
    mask2d = ((xx**2 + yy**2) < 0.85).astype(np.float32)
    mask = np.broadcast_to(mask2d[None, :, :, None, None],
                           (n, x, y, z, 1)).astype(np.float32)

    sig = np.asarray(physics.ase_signal(jnp.asarray(oef), jnp.asarray(dbv),
                                        scan)) * 800.0
    noise = rng.normal(size=sig.shape).astype(np.float32) * sig.mean() / 80.0
    data = np.concatenate([(sig + noise) * mask, mask], -1)
    return data, oef, dbv, mask[..., 0]


def clean_checkpoints(outdir):
    """Remove stale checkpoints so a fresh run cannot auto-resume a
    previous A/B's final_model.msgpack and silently report the OLD
    run's quality under the new flags."""
    import glob
    import os

    stale = glob.glob(os.path.join(outdir, "*.msgpack*"))
    for p in stale:
        os.remove(p)
    if stale:
        print(f"removed {len(stale)} stale checkpoint(s) from {outdir} "
              "(pass --resume to reuse them)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ft-epochs", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/ft_validate")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="encoder trunk compute dtype (bf16 A/B for the "
                         "training-quality validation, VERDICT r1 #4)")
    ap.add_argument("--fused-elbo", default="auto",
                    help="fused_elbo mode for the A/B (auto|on|off|host)")
    ap.add_argument("--seed", type=int, default=None,
                    help="override cfg.train.seed (quality-variance A/Bs)")
    ap.add_argument("--resume", action="store_true",
                    help="reuse checkpoints already in --outdir (default "
                         "trains FRESH: the Trainer auto-resumes, so a "
                         "stale final_model.msgpack from a previous A/B "
                         "would silently report the OLD run's quality "
                         "under the new flags)")
    args = ap.parse_args()

    if not args.resume:
        clean_checkpoints(args.outdir)

    import dataclasses

    import jax

    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.infer import posterior_maps
    from qbold_vi_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(
        OPTIMAL,
        model=dataclasses.replace(OPTIMAL.model,
                                  compute_dtype=args.compute_dtype),
        train=dataclasses.replace(
            OPTIMAL.train, pt_on_device_synth=True, no_pt_epochs=30,
            no_ft_epochs=args.ft_epochs, save_directory=args.outdir,
            fused_elbo=args.fused_elbo,
            **({"seed": args.seed} if args.seed is not None else {})),
        scan=dataclasses.replace(OPTIMAL.scan, simulate_noise=True),
    )
    data, oef_true, dbv_true, mask = make_subjects(cfg.scan)

    t0 = time.time()
    tr = Trainer(cfg)
    tr.pretrain()
    t_pt = time.time() - t0
    print(f"pretrain: {t_pt:.1f}s")

    t0 = time.time()
    tr.finetune(data, study_data=data[:2])
    t_ft = time.time() - t0
    print(f"finetune ({args.ft_epochs} epochs x "
          f"{cfg.train.ft_steps_per_epoch} steps): {t_ft:.1f}s")

    maps = posterior_maps(tr.tuner, tr.state.params, data,
                          jax.random.PRNGKey(9), use_first_op=False)

    # full fine-tuned export (posterior + likelihood/KL/residual maps,
    # reference model.py:805-847): round 2 measured 56.6 s host-looped;
    # the streamed fori_loop path should land in seconds
    from qbold_vi_tpu.infer import save_predictions

    k = 5 if cfg.model.use_mvg else 4
    from qbold_vi_tpu.train import data as data_pipe

    import jax.numpy as jnp

    @jax.jit
    def enc(images):
        return tr.tuner.encode(tr.state.params, images)

    priors = data_pipe.predict_priors(enc, np.float32(data), k)
    t0 = time.time()
    save_predictions(tr.tuner, cfg, tr.state.params, data,
                     args.outdir + "/pred", jax.random.PRNGKey(10),
                     use_first_op=False, fine_tuned=True, priors=priors)
    print(f"fine-tuned 7-map export ({data.shape[0]} subjects): "
          f"{time.time() - t0:.1f}s")

    m = mask > 0
    oef_err = np.abs(maps["oef"][..., 0] - oef_true)[m].mean()
    dbv_err = np.abs(maps["dbv"][..., 0] - dbv_true)[m].mean()
    oef_corr = np.corrcoef(maps["oef"][..., 0][m], oef_true[m])[0, 1]
    dbv_corr = np.corrcoef(maps["dbv"][..., 0][m], dbv_true[m])[0, 1]
    print(f"masked posterior-mean quality: |OEF err|={oef_err:.4f} "
          f"(corr {oef_corr:.3f}), |DBV err|={dbv_err:.4f} "
          f"(corr {dbv_corr:.3f})")


if __name__ == "__main__":
    main()
