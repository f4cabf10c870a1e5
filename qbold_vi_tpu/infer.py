"""Full-brain amortized inference and prediction export.

The reference's inference path (reference: model.py:772-887
``save_predictions``) re-runs ``model.predict`` 100-200 times from
Python. The TPU re-design jits ONE summarization program per volume
chunk -- encoder pass + S-sample posterior summaries (+ likelihood / KL
maps for fine-tuned models) all fused on device -- and streams subjects
through it; with a data-parallel mesh the voxel batch shards over ICI.
This is the path BASELINE.md's "<1 s / 1M-voxel" target maps onto.

Artifact layout matches the reference exactly:
``<name>_oef/_dbv/_r2p/_logstds[.nii.gz]`` (``_logstds`` = the 3-channel
200-sample MC variance maps, the semantics the reference's executed
save_predictions gives that file) + optional ``_likelihood/_kl/_residual``
maps and FSL MNI-space exports; ``_raw_logstds`` (extension) keeps the
raw squashed log-std/offdiag head channels.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import QBoldConfig
from .models.vi import FineTuner
from .train import losses

__all__ = ["posterior_maps", "elbo_maps", "elbo_maps_sharded",
           "save_predictions"]


@partial(jax.jit, static_argnames=("tuner", "no_samples", "use_first_op",
                                   "method"))
def _summarize(tuner: FineTuner, params, key, images,
               no_samples: int = 200, use_first_op: bool = True,
               method: str = "quadrature"):
    """One fused device program: encode + posterior summaries
    (reference: model.py:776-803). ``method``: "quadrature" evaluates
    the same posterior expectations by deterministic Gaussian quadrature
    (ops/quadrature.py -- at least as accurate as the 200-sample MC
    estimator everywhere, ~5 orders better in the trained regime, no
    PRNG); "mc" keeps the reference's streaming MC estimator."""
    cfg = tuner.cfg
    q, raw_log_stds = _encode_q(tuner, params, images,
                                use_first_op=use_first_op)
    dist = tuner.dist
    dw_coeff = tuner.scan.dw_coeff * tuner.scan.hct
    if method == "quadrature":
        from .ops.quadrature import posterior_summaries_quadrature

        means, stds = posterior_summaries_quadrature(
            q, mvg=cfg.use_mvg, oef_range=cfg.oef_range,
            min_oef=cfg.min_oef, dbv_range=cfg.dbv_range,
            min_dbv=cfg.min_dbv, dw_coeff=float(dw_coeff))
    else:
        means, stds = dist.posterior_means_streamed(
            key, q, cfg.use_mvg, no_samples=no_samples,
            r2p_fn=lambda oef, dbv: dw_coeff * oef * dbv)
    return {"means": means, "stds": stds, "raw_log_stds": raw_log_stds}


def _check_method(method: str) -> None:
    """Validate the estimator name at the API boundary: the internal
    dispatches are 'quadrature'-vs-everything-else, so a typo ('quad',
    'Quadrature') would otherwise silently select the stochastic MC
    estimator and return PRNG-dependent maps the caller believes are
    deterministic."""
    if method not in ("quadrature", "mc"):
        raise ValueError(
            f"method must be 'quadrature' or 'mc', got {method!r}")


def to_channel_major(data: np.ndarray) -> np.ndarray:
    """The fused serving-layout transform: ``(..., C)`` volumes ->
    contiguous channel-major ``(C, N)`` (voxels on the minor axis).
    Single owner of the contract every fused-path uploader uses
    (posterior_maps chunks, the sharded path, bench.py, the fused
    serving blob's input)."""
    return np.ascontiguousarray(
        np.asarray(data).reshape(-1, data.shape[-1]).T)


def _resolve_fused_infer(cfg, use_pallas=None) -> bool | None:
    """Resolve ModelConfig.fused_infer -> None (off) | False (compiled)
    | True (Mosaic interpreter). "auto" turns the fused stream-1 encode
    kernel (ops/pallas_infer.py) on for TPU backends when the activation
    is covered -- and respects an explicit caller ``use_pallas=False``
    opt-out (the forced "on"/"interpret" modes override it)."""
    mode = str(cfg.fused_infer).strip().lower()
    if mode not in ("auto", "on", "off", "interpret"):
        raise ValueError(
            f"fused_infer must be auto|on|off|interpret, got "
            f"{cfg.fused_infer!r}")
    if mode == "off" or (mode == "auto" and use_pallas is False):
        return None
    from .ops.pallas_infer import fused_infer_available

    ok = fused_infer_available(cfg.activation)
    if mode == "auto":
        if not ok or jax.default_backend() not in ("tpu", "axon"):
            return None
        return False
    if not ok:
        raise ValueError(
            f"fused_infer was forced on but activation "
            f"{cfg.activation!r} has no Mosaic-safe implementation "
            "(ops/pallas_infer.SUPPORTED_ACTS)")
    return mode == "interpret"


@partial(jax.jit, static_argnames=("tuner", "interpret", "mask_channel",
                                   "input_layout", "method", "no_samples",
                                   "antithetic"))
def _fused_posterior_summaries(tuner: FineTuner, params, images,
                               interpret: bool = False,
                               mask_channel: bool = False,
                               input_layout: str = "voxel",
                               method: str = "quadrature",
                               seed: jax.Array | None = None,
                               no_samples: int = 200,
                               antithetic: bool = True):
    """Fully-kernelised inference, channel-major end to end -- no
    padded-lane HBM round-trips of (N, 5|60)-channel intermediates (the
    layout tax the round-3 probe measured, benchmarks/RESULTS.md).
    ``method="quadrature"`` (default) runs ONE kernel: stream-1 encode +
    deterministic quadrature summaries + raw-log-std transforms, q never
    leaving VMEM (ops/pallas_infer.py::encode_quad_fused); ``"mc"`` runs
    the encode kernel feeding the packed MC summarize kernel.

    Returns CHANNEL-major flattened maps:
    (means_t (3, N), vars_t (3, N), raw_log_stds_t (2|3, N)); callers
    transpose on the host. Same math as the _encode_q +
    quad_posterior_summaries composition (gated in
    tests/test_pallas_infer.py)."""
    from .models.encoder import _dtype_of

    cfg = tuner.cfg
    n = (int(images.shape[1]) if input_layout == "channel"
         else int(np.prod(images.shape[:-1])))
    trunk = ("bfloat16" if _dtype_of(cfg) == jnp.bfloat16 else "float32")
    dwc = float(tuner.scan.dw_coeff * tuner.scan.hct)
    enc_kw = dict(se_idx=tuner.scan.se_idx,
                  multi_image=cfg.multi_image_normalisation,
                  activation=cfg.activation,
                  n_blocks=cfg.no_intermediate_layers, trunk=trunk,
                  interpret=interpret, mask_channel=mask_channel,
                  input_layout=input_layout)
    ranges = dict(mvg=cfg.use_mvg, oef_range=cfg.oef_range,
                  min_oef=cfg.min_oef, dbv_range=cfg.dbv_range,
                  min_dbv=cfg.min_dbv, dw_coeff=dwc)
    if method == "quadrature":
        from .ops.pallas_infer import encode_quad_fused

        means_t, vars_t, raw_t = encode_quad_fused(
            images, params["encoder"], **enc_kw, **ranges,
            # tiny interpreter tiles: the Mosaic interpreter (CPU tests)
            # executes the unrolled node loops per element
            **({"rows": 256} if interpret else {}))
        if not cfg.use_mvg:
            raw_t = raw_t[:2]
        return means_t[:, :n], vars_t[:, :n], raw_t[:, :n]

    if seed is None:
        raise ValueError("method='mc' needs an int32 seed for the "
                         "on-chip PRNG")
    from .ops.pallas_infer import encode_q1_packed
    from .ops.pallas_summarize import mc_posterior_summaries_packed

    q_t = encode_q1_packed(
        images, params["encoder"],
        **({"rows": 256, "pad_multiple": 64} if interpret else {}),
        **enc_kw)
    means_t, vars_t = mc_posterior_summaries_packed(
        q_t, seed, no_samples=no_samples, antithetic=antithetic,
        interpret=interpret, lanes=8 if interpret else 1024, **ranges)
    dist = tuner.dist
    raws = [dist.transform_std(q_t[1:2]), dist.transform_std(q_t[3:4])]
    if cfg.use_mvg:
        raws.append(dist.transform_offdiag(q_t[4:5]))
    raw_t = jnp.concatenate(raws, 0)
    return means_t[:, :n], vars_t[:, :n], raw_t[:, :n]


# Bound on chunks staged ahead of the gather phase: inputs + outputs of
# at most this many chunks live on the device at once (beyond that the
# oldest chunk is gathered before the next is dispatched). Deep enough
# to keep the upload->compute->download pipeline full through the
# tunnel; bounded so a several-hundred-subject cohort cannot
# accumulate its whole input stack in HBM.
_MAX_IN_FLIGHT = 8


def _chunk_maps_impl(tuner: FineTuner, params, block, k, no_samples: int,
                     use_first_op: bool, method: str, use_pallas: bool,
                     antithetic: bool = True):
    """Shared body of the non-fused per-chunk map program: mask zeroing,
    encoder pass, posterior summaries and the map reshapes. Jitted
    whole by _chunk_maps for the chunked host loop; called per-device
    inside posterior_maps_sharded's shard_map (single owner of the
    estimator dispatch, so the chunked and sharded paths cannot
    diverge)."""
    cfg = tuner.cfg
    masked = block[..., :-1] * block[..., -1:]
    if not use_pallas:
        return _summarize(tuner, params, k, masked, no_samples=no_samples,
                          use_first_op=use_first_op, method=method)
    q, raw_log_stds = _encode_q(tuner, params, masked,
                                use_first_op=use_first_op)
    dwc = float(tuner.scan.dw_coeff * tuner.scan.hct)
    if method == "quadrature":
        from .ops.quadrature import quad_posterior_summaries

        means, variances = quad_posterior_summaries(
            q.reshape(-1, q.shape[-1]), mvg=cfg.use_mvg,
            oef_range=cfg.oef_range, min_oef=cfg.min_oef,
            dbv_range=cfg.dbv_range, min_dbv=cfg.min_dbv, dw_coeff=dwc)
    else:
        from .ops.pallas_summarize import mc_posterior_summaries

        seed = jax.random.randint(k, (), 0, np.int32(2**31 - 1))
        means, variances = mc_posterior_summaries(
            q.reshape(-1, q.shape[-1]), seed, no_samples=no_samples,
            mvg=cfg.use_mvg, oef_range=cfg.oef_range, min_oef=cfg.min_oef,
            dbv_range=cfg.dbv_range, min_dbv=cfg.min_dbv, dw_coeff=dwc,
            antithetic=antithetic)
    return {"means": means.reshape(q.shape[:-1] + (3,)),
            "stds": variances.reshape(q.shape[:-1] + (3,)),
            "raw_log_stds": raw_log_stds}


@partial(jax.jit, static_argnames=("tuner", "no_samples", "use_first_op",
                                   "method", "use_pallas", "antithetic"))
def _chunk_maps(tuner: FineTuner, params, block, k, no_samples: int,
                use_first_op: bool, method: str, use_pallas: bool,
                antithetic: bool = True):
    """ONE device program per non-fused subject chunk. Keeping the
    whole chunk under a single jit matters on remote (tunnel) backends,
    where every eager op between jitted calls costs a dispatch
    round-trip (~35-40 ms each; CLAUDE.md) -- the round-3 stream-2
    cohort export spent seconds in exactly those seams."""
    return _chunk_maps_impl(tuner, params, block, k, no_samples,
                            use_first_op, method, use_pallas, antithetic)


@partial(jax.jit, static_argnames=("tuner", "use_first_op"))
def _encode_q(tuner: FineTuner, params, images, use_first_op: bool = True):
    """Encoder pass + raw-log-std maps (the deterministic half of
    _summarize), for use with the Pallas summarization kernel."""
    cfg = tuner.cfg
    q1, q2, _ = tuner.encode(params, images)
    q = q1 if use_first_op else q2
    if use_first_op and cfg.infer_inv_gamma:
        q = q[..., :-4]
    dist = tuner.dist
    raw_log_stds = [dist.transform_std(q[..., 1:2]),
                    dist.transform_std(q[..., 3:4])]
    if cfg.use_mvg:
        raw_log_stds.append(dist.transform_offdiag(q[..., 4:5]))
    return q, jnp.concatenate(raw_log_stds, -1)


def _fetch_global(x) -> np.ndarray:
    """np.asarray for a possibly multi-PROCESS-sharded jax.Array: under
    multi-host meshes a device-sharded output is not fully addressable
    from any one process, so it is allgathered (DCN) to every host
    first -- the sharded export paths then work identically single- and
    multi-controller (certified by parallel/multihost.py's map stage)."""
    if (hasattr(x, "is_fully_addressable") and not x.is_fully_addressable):
        from jax.experimental import multihost_utils

        # tiled=True is REQUIRED for global arrays; it reshards to
        # fully-replicated (a real allgather over whichever axes are
        # sharded) and fetches the global value
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _pad_chunk(block: np.ndarray, chunk: int):
    """Zero-pad a ragged final subject chunk to the compiled chunk shape
    (padded subjects carry an all-zero mask). A second shape would
    re-trace and re-compile the whole encode/summarize program -- remote
    TPU compiles cost minutes, the pad costs one dead pass."""
    block = np.float32(block)
    n = block.shape[0]
    if n == chunk:
        return block, n
    pad = np.zeros((chunk - n,) + block.shape[1:], block.dtype)
    return np.concatenate([block, pad], axis=0), n


def posterior_maps(tuner: FineTuner, params, data: np.ndarray, key,
                   no_samples: int = 200, use_first_op: bool = True,
                   chunk: int = 2, use_pallas: bool | None = None,
                   method: str = "quadrature",
                   antithetic: bool = True) -> dict:
    """Posterior mean/std maps for (S, X, Y, Z, n_taus+1) masked volumes.

    ``method="quadrature"`` (default) evaluates the posterior
    expectations by deterministic Gaussian quadrature (ops/quadrature.py
    -- bit-stable across runs, at least as accurate as the reference's
    200-sample MC estimator everywhere and ~5 orders better on trained
    posteriors, ~2.5x faster); ``method="mc"`` keeps the reference's MC
    estimator (model.py:326-343). On TPU backends either estimator runs
    as a fused Pallas kernel (ops/quadrature.py /
    ops/pallas_summarize.py); elsewhere the jnp paths are used. All
    four are gated against each other in tests/test_quadrature.py and
    tests/test_pallas.py.

    ``antithetic`` (Pallas "mc" only): the kernel default pairs each
    draw with its negation -- unbiased, lower variance, ~33% fewer
    transcendentals, but a DIFFERENT sampling distribution than the
    reference's plain-iid draws; pass False for an estimator whose
    sampling distribution matches the reference's (the documented RNG
    stance compares distributions, never streams).

    Returns numpy maps: oef, dbv, r2p (each (S,X,Y,Z,1)), stds
    (S,X,Y,Z,3), raw_log_stds (S,X,Y,Z,2|3).
    """
    _check_method(method)
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    fused = (_resolve_fused_infer(tuner.cfg, use_pallas)
             if (method in ("quadrature", "mc") and use_first_op)
             else None)

    # PRNG keys are only consumed by the MC estimator and the jnp
    # fallback: the fused quadrature path is deterministic, and an
    # eager per-chunk split/randint on remote backends would cost a
    # dead tunnel dispatch (+ one RNG compile) per chunk
    needs_key = method == "mc" or fused is None

    # Pipelined chunk loop: DISPATCH chunks ahead of the gather so the
    # backend overlaps uploads, compute and downloads (a single-phase
    # loop serialises upload(i+1) behind download(i) -- through the
    # remote TPU tunnel that is one dead round-trip latency + transfer
    # per chunk, the stream-2 cohort export's dominant warm cost,
    # RESULTS.md). At most _MAX_IN_FLIGHT chunks are staged at once so
    # device memory stays bounded on arbitrarily large cohorts.
    def _gather(item):
        n_blk, cm_shape, out = item
        if cm_shape is not None:
            # channel-major device arrays -> host-side transpose (a
            # device-side (N, 3) write would re-pay the padded-minor
            # tile layout the fused path exists to avoid)
            return {
                k2: np.moveaxis(np.asarray(v), 0, -1).reshape(
                    cm_shape + (v.shape[0],))[:n_blk]
                for k2, v in out.items()
            }
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:n_blk], out)

    staged, outs = [], []
    for i in range(0, data.shape[0], chunk):
        raw, n_blk = _pad_chunk(data[i:i + chunk], chunk)
        k = None
        if needs_key:
            key, k = jax.random.split(key)
        if fused is not None:
            # upload the chunk CHANNEL-MAJOR (T+1, N): the transpose
            # rides the host->device copy and the kernel's input tiles
            # become dense-minor -- the padded voxel-major layout DMAs
            # at ~1/3 the rate (RESULTS.md probe). Mask zeroing is fused
            # into the kernel's first read.
            cm = jnp.asarray(to_channel_major(raw))
            seed = (jax.random.randint(k, (), 0, np.int32(2**31 - 1))
                    if method == "mc" else None)
            means_t, vars_t, raw_t = _fused_posterior_summaries(
                tuner, params, cm, interpret=fused, mask_channel=True,
                input_layout="channel", method=method, seed=seed,
                no_samples=no_samples, antithetic=antithetic)
            staged.append((n_blk, raw.shape[:-1],
                           {"means": means_t, "stds": vars_t,
                            "raw_log_stds": raw_t}))
        else:
            out = _chunk_maps(tuner, params, jnp.asarray(raw), k,
                              no_samples=no_samples,
                              use_first_op=use_first_op, method=method,
                              use_pallas=use_pallas, antithetic=antithetic)
            staged.append((n_blk, None, out))
        if len(staged) >= _MAX_IN_FLIGHT:
            outs.append(_gather(staged.pop(0)))
    outs.extend(_gather(s) for s in staged)
    cat = {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}
    means = cat["means"]
    return {
        "oef": means[..., 0:1], "dbv": means[..., 1:2], "r2p": means[..., 2:3],
        "stds": cat["stds"], "raw_log_stds": cat["raw_log_stds"],
    }


@partial(jax.jit, static_argnames=("tuner", "cfg", "no_samples",
                                   "kl_samples", "use_pallas_kl",
                                   "with_kl"))
def _elbo_maps_one(tuner: FineTuner, cfg: QBoldConfig, params, key,
                   block, priors, no_samples: int = 100,
                   kl_samples: int = 100, use_pallas_kl: bool = False,
                   with_kl: bool = True):
    """Per-voxel likelihood / KL maps from the fine-tuned model
    (reference: model.py:805-847), fused on device. ``block`` is the
    raw (B, X, Y, Z, taus+1) chunk with the mask channel attached --
    the mask split and zeroing run under the same jit, so a chunk is
    ONE remote dispatch.

    The S stochastic decoder passes STREAM through a fori_loop with
    O(voxels) state -- one posterior draw, one physics decode and one
    NLL row per iteration, accumulating (sum NLL, sum pred) -- instead
    of materialising the (S, B, X, Y, Z, taus) prediction stack the
    reference's 100 predict passes imply (model.py:805-817). Same math
    (mean NLL map, mean-prediction residual), ~S x less HBM: this is
    what took the round-2 export from 56.6 s to seconds at the
    RESULTS.md workload (round-2 verdict weak #5)."""
    from .ops import physics

    mask = block[..., -1:]
    images = block[..., :-1] * mask
    k_dec, k_kl = jax.random.split(key)
    _, q, im_sigma = tuner.encode(params, images)
    if not cfg.model.heteroscedastic_noise:
        im_sigma = jnp.full_like(im_sigma, jnp.exp(params["log_sigma"]))
    # same key-split structure as the materialised tuner.apply path
    # (split off the dropout key, then sample_many's per-sample split),
    # so the streamed maps are BIT-IDENTICAL to the round-2 export
    k_sample, _ = jax.random.split(k_dec)
    keys = jax.random.split(k_sample, no_samples)
    dist = tuner.dist
    msk = jnp.broadcast_to(mask, images.shape[:-1] + (1,))

    def body(i, acc):
        nll_sum, pred_sum = acc
        s = dist.sample(keys[i], q, cfg.model.use_mvg)
        pred = physics.ase_signal(s[..., 0], s[..., 1], tuner.scan,
                                  full_model=tuner.full_model,
                                  include_blood=tuner.use_blood,
                                  quad_rule=cfg.model.quad_rule,
                                  max_oef=cfg.model.min_oef
                                  + cfg.model.oef_range)
        nll = losses.fine_tune_nll(cfg.model, tuner.scan.se_idx, images,
                                   pred, im_sigma, msk, return_mean=False)
        return nll_sum + nll, pred_sum + pred

    nll_sum, pred_sum = jax.lax.fori_loop(
        0, no_samples, body,
        (jnp.zeros(images.shape[:-1] + (1,), jnp.float32),
         jnp.zeros_like(images)))
    nll_map = nll_sum / no_samples
    mean_pred = pred_sum / no_samples
    if cfg.model.use_population_prior:
        priors = tuner.prior_params(params, q)
    if not with_kl:
        # No prior maps available (and no population prior): the KL map
        # is undefined -- skip it rather than trace kl_loss over None
        kl_map = None
    elif use_pallas_kl and cfg.model.use_mvg:
        # fused MC-KL kernel (ops/pallas_summarize.py): on-chip PRNG,
        # one HBM pass over (q, prior) per voxel
        from .ops.pallas_summarize import mc_kl_map

        seed = jax.random.randint(k_kl, (), 0, np.int32(2**31 - 1))
        kl_flat = mc_kl_map(q.reshape(-1, q.shape[-1]),
                            priors.reshape(-1, q.shape[-1]), seed,
                            no_samples=kl_samples, mvg=True)
        kl_map = jnp.where(mask > 0, kl_flat.reshape(mask.shape), 0.0)
    else:
        kl_map = losses.kl_loss(k_kl, tuner.dist, cfg.model, priors, q, mask,
                                return_mean=False, no_samples=kl_samples)

    # Mean-|residual| map on normalised signals (reference model.py:838-847)
    eps = 1e-3
    se = tuner.scan.se_idx
    if cfg.model.multi_image_normalisation:
        # clamp the 3-image window at the grid edge: se == 0 would slice
        # [-1:2] -> EMPTY -> NaN maps (same guard as losses.fine_tune_nll
        # and encoder.normalise_data; reachable via `transfer` to a tau
        # grid starting at 0)
        lo = max(se - 1, 0)
        t_ref = jnp.mean(images[..., lo:se + 2], -1, keepdims=True)
        p_ref = jnp.mean(mean_pred[..., lo:se + 2], -1, keepdims=True)
    else:
        t_ref = jnp.mean(images[..., se:se + 1], -1, keepdims=True)
        p_ref = jnp.mean(mean_pred[..., se:se + 1], -1, keepdims=True)
    residual = jnp.mean(jnp.abs(images / (t_ref + eps)
                                - mean_pred / (p_ref + eps)), -1, keepdims=True)
    out = {"likelihood": nll_map, "residual": residual}
    if kl_map is not None:
        out["kl"] = kl_map
    return out


def posterior_maps_sharded(tuner: FineTuner, params, data: np.ndarray, key,
                           mesh, no_samples: int = 200,
                           use_first_op: bool = True,
                           use_pallas: bool | None = None,
                           method: str = "quadrature",
                           antithetic: bool = True) -> dict:
    """Mesh-parallel full-brain inference: volumes shard over the
    ``data`` axis (leading/subject dim), params replicate, each device
    summarizes its shard (the Pallas kernel runs per-device inside
    shard_map) -- voxel data parallelism end to end, no collectives
    needed on the forward path.

    data: (S, X, Y, Z, n_taus+1), ANY subject count: when S does not
    divide the mesh the stack is zero-padded to the next multiple (dead
    subjects carry an all-zero mask and cost one summarization pass on
    some devices) and the padded rows are sliced off the returned maps.
    Returns the same map dict as posterior_maps.
    """
    _check_method(method)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .parallel import mesh as pmesh

    n_subj = data.shape[0]
    n_dev = mesh.devices.size
    pad = (-n_subj) % n_dev
    if pad:
        data = np.concatenate(
            [data, np.zeros((pad,) + data.shape[1:], data.dtype)], axis=0)

    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    cfg = tuner.cfg
    fused = (_resolve_fused_infer(cfg, use_pallas)
             if (method in ("quadrature", "mc") and use_first_op)
             else None)

    if fused is not None:
        # fused channel-major path: volumes upload as one (T+1, N) array
        # sharded on the minor (voxel) axis -- subject-aligned, since
        # S_pad divides the mesh -- and each device runs the stream-1
        # encode + packed quadrature kernels on its dense-minor shard.
        # Outputs shard the same axis and concatenate in subject-major
        # order.
        def local_fused(block, k):
            seed = (jax.random.randint(k[0], (), 0, np.int32(2**31 - 1))
                    if method == "mc" else None)
            m, v, r = _fused_posterior_summaries(
                tuner, params, block, interpret=fused, mask_channel=True,
                input_layout="channel", method=method, seed=seed,
                no_samples=no_samples, antithetic=antithetic)
            return {"means": m, "stds": v, "raw_log_stds": r}

        spec = P(pmesh.DATA_AXIS)
        vspec = P(None, pmesh.DATA_AXIS)
        fn = shard_map(local_fused, mesh=mesh, in_specs=(vspec, spec),
                       out_specs={"means": vspec, "stds": vspec,
                                  "raw_log_stds": vspec},
                       check_vma=False)
        keys = jax.random.split(key, n_dev)
        cm = to_channel_major(np.float32(data))
        block = jax.device_put(
            cm, jax.sharding.NamedSharding(mesh, vspec))
        out = jax.jit(fn)(block, jax.device_put(
            keys, jax.sharding.NamedSharding(mesh, spec)))
        shape = data.shape[:-1]
        cat = {k2: np.moveaxis(_fetch_global(v), 0, -1).reshape(
                   shape + (v.shape[0],))[:n_subj]
               for k2, v in out.items()}
        means = cat["means"]
        return {
            "oef": means[..., 0:1], "dbv": means[..., 1:2],
            "r2p": means[..., 2:3],
            "stds": cat["stds"], "raw_log_stds": cat["raw_log_stds"],
        }

    def local(block, k):
        return _chunk_maps_impl(tuner, params, block, k[0],
                                no_samples=no_samples,
                                use_first_op=use_first_op, method=method,
                                use_pallas=use_pallas,
                                antithetic=antithetic)

    spec = P(pmesh.DATA_AXIS)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec),
                   out_specs={"means": spec, "stds": spec,
                              "raw_log_stds": spec},
                   check_vma=False)
    keys = jax.random.split(key, n_dev)
    block = pmesh.shard_batch(mesh, np.float32(data))
    out = jax.jit(fn)(block, jax.device_put(
        keys, jax.sharding.NamedSharding(mesh, spec)))
    cat = jax.tree_util.tree_map(
        lambda x: _fetch_global(x)[:n_subj], out)
    means = cat["means"]
    return {
        "oef": means[..., 0:1], "dbv": means[..., 1:2], "r2p": means[..., 2:3],
        "stds": cat["stds"], "raw_log_stds": cat["raw_log_stds"],
    }


@partial(jax.jit, static_argnames=("n",))
def _chunk_key_chain(key, n: int):
    """The first ``n`` per-chunk keys of elbo_maps' sequential
    ``key, k = split(key)`` chain, as one (n, 2) stack in ONE compiled
    program (an eager per-subject split costs a tunnel round-trip each).
    Single source of the chain, so the sharded export (one key per
    subject) is BIT-identical to the chunked path at chunk=1."""

    def body(carry, _):
        carry, k = jax.random.split(carry)
        return carry, k

    _, ks = jax.lax.scan(body, key, None, length=n)
    return ks


def elbo_maps_sharded(tuner: FineTuner, cfg: QBoldConfig, params,
                      data: np.ndarray, priors: Optional[np.ndarray], key,
                      mesh, no_samples: int = 100,
                      use_pallas_kl: bool | None = None) -> dict:
    """Mesh-parallel likelihood/KL/residual maps: subjects shard over the
    ``data`` axis exactly like posterior_maps_sharded (zero-padded to the
    mesh, dead subjects carry an all-zero mask and are sliced off), each
    device runs the streamed fori_loop export per local subject. On a
    real pod this was the one export stage that did not scale (round-3
    verdict weak #5; reference: model.py:805-847 is the single-device
    semantics being sharded).

    Per-subject keys follow elbo_maps' own chunk=1 split chain
    (_chunk_key_chain), so the sharded maps use IDENTICAL sample draws
    to the single-device export given the same ``key`` -- they match to
    fp/compile tolerance (XLA fusion ordering is the only difference),
    gated in tests/test_infer_sharded.py and dryrun_multichip stage 5c.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from .parallel import mesh as pmesh

    if use_pallas_kl is None:
        use_pallas_kl = jax.default_backend() in ("tpu", "axon")
    with_kl = priors is not None or cfg.model.use_population_prior
    have_priors = priors is not None

    n_subj = data.shape[0]
    n_dev = mesh.devices.size
    pad = (-n_subj) % n_dev
    data = np.float32(data)
    if pad:
        data = np.concatenate(
            [data, np.zeros((pad,) + data.shape[1:], data.dtype)], axis=0)
        if have_priors:
            priors = np.concatenate(
                [np.float32(priors),
                 np.zeros((pad,) + priors.shape[1:], np.float32)], axis=0)
    keys = _chunk_key_chain(key, n_subj + pad)

    def _one(blk1, p1, k1):
        out = _elbo_maps_one(tuner, cfg, params, k1, blk1[None],
                             None if p1 is None else p1[None],
                             no_samples=no_samples,
                             use_pallas_kl=use_pallas_kl, with_kl=with_kl)
        return jax.tree_util.tree_map(lambda x: x[0], out)

    def local(block, pri, ks):
        if have_priors:
            return jax.lax.map(lambda a: _one(a[0], a[1], a[2]),
                               (block, pri, ks))
        return jax.lax.map(lambda a: _one(a[0], None, a[1]), (block, ks))

    spec = P(pmesh.DATA_AXIS)
    out_keys = (["likelihood", "residual", "kl"] if with_kl
                else ["likelihood", "residual"])
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs={k2: spec for k2 in out_keys},
                   check_vma=False)
    block = pmesh.shard_batch(mesh, data)
    # without priors a dummy (n_dev,) carrier keeps the shard_map arity
    # fixed (its values are never read: _one passes None through)
    pri = pmesh.shard_batch(
        mesh, np.float32(priors) if have_priors
        else np.zeros((n_dev,), np.float32))
    out = jax.jit(fn)(block, pri,
                      jax.device_put(np.asarray(keys),
                                     jax.sharding.NamedSharding(mesh, spec)))
    return jax.tree_util.tree_map(
        lambda x: _fetch_global(x)[:n_subj], out)


def elbo_maps(tuner: FineTuner, cfg: QBoldConfig, params, data: np.ndarray,
              priors: Optional[np.ndarray], key, no_samples: int = 100,
              chunk: int = 1, use_pallas_kl: bool | None = None) -> dict:
    """Chunked likelihood/KL/residual maps over subjects. On TPU backends
    (and MVG posteriors) the KL map runs in the fused Pallas kernel.

    The KL map needs a prior per voxel: ``priors`` (predicted by the
    PRETRAINED encoder, reference train.py:26-31) or the model's own
    population prior. With neither, the "kl" key is omitted (the
    reference cannot hit this state -- its fine-tuner always evaluates
    against the dataset priors)."""
    if use_pallas_kl is None:
        use_pallas_kl = jax.default_backend() in ("tpu", "axon")
    with_kl = priors is not None or cfg.model.use_population_prior
    # dispatch chunks ahead of the gather, bounded in-flight window
    # (see posterior_maps: a single-phase loop serialises every chunk
    # behind the previous chunk's download through the tunnel)
    def _gather(item):
        n_blk, out = item
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x)[:n_blk], out)

    staged, outs = [], []
    for i in range(0, data.shape[0], chunk):
        raw, n_blk = _pad_chunk(data[i:i + chunk], chunk)
        p = None
        if priors is not None:
            p = jnp.asarray(_pad_chunk(priors[i:i + chunk], chunk)[0])
        key, k = jax.random.split(key)
        staged.append((n_blk, _elbo_maps_one(
            tuner, cfg, params, k, jnp.asarray(raw), p,
            no_samples=no_samples, use_pallas_kl=use_pallas_kl,
            with_kl=with_kl)))
        if len(staged) >= _MAX_IN_FLIGHT:
            outs.append(_gather(staged.pop(0)))
    outs.extend(_gather(s) for s in staged)
    return {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}


def save_predictions(tuner: FineTuner, cfg: QBoldConfig, params,
                     data: np.ndarray, filename: str, key,
                     transform_directory: Optional[str] = None,
                     use_first_op: bool = True,
                     fine_tuned: bool = False,
                     priors: Optional[np.ndarray] = None,
                     mesh=None, method: str = "quadrature") -> dict:
    """Posterior summary export (reference: model.py:772-887).

    Writes ``<filename>_oef/_dbv/_r2p/_logstds.nii.gz``; with
    ``fine_tuned`` also ``_likelihood/_kl/_residual``; with a transform
    directory also the FSL MNI-space maps. With ``mesh`` the posterior
    summarization shards over the data axis for ANY subject count
    (posterior_maps_sharded pads to the mesh and slices).
    ``method``: "quadrature" (deterministic, default) or "mc" (the
    reference's sampling estimator). Returns the map dict.
    """
    from .io import fsl, nifti

    k1, k2 = jax.random.split(key)
    if mesh is not None:
        maps = posterior_maps_sharded(tuner, params, data, k1, mesh,
                                      use_first_op=use_first_op,
                                      method=method)
    else:
        maps = posterior_maps(tuner, params, data, k1,
                              use_first_op=use_first_op, method=method)

    if fine_tuned:
        if priors is None and not cfg.model.use_population_prior:
            import warnings
            warnings.warn(
                "fine-tuned export without priors or a population prior: "
                "the _kl map needs the pretrained-encoder priors "
                "(reference train.py:26-31) -- pass priors= (e.g. from "
                "Trainer.pretrained_params); exporting _likelihood/"
                "_residual only", stacklevel=2)
        if mesh is not None:
            # the heaviest export stage (S stochastic decode passes per
            # voxel) shards over subjects like the posterior maps above
            extra = elbo_maps_sharded(tuner, cfg, params, data, priors,
                                      k2, mesh)
        else:
            extra = elbo_maps(tuner, cfg, params, data, priors, k2)
        maps.update(extra)
        nifti.save_im_data(extra["likelihood"], filename + "_likelihood",
                           transform_directory)
        if "kl" in extra:
            nifti.save_im_data(extra["kl"], filename + "_kl",
                               transform_directory)
        nifti.save_im_data(extra["residual"], filename + "_residual",
                           transform_directory)

    if transform_directory and fsl.have_fsl():
        if nifti.have_nibabel():
            fsl.warp_maps_to_mni(maps["oef"], maps["dbv"], maps["r2p"],
                                 filename, transform_directory)
        else:
            import warnings
            warnings.warn(
                "transform_directory given but nibabel is unavailable: "
                "skipping the MNI-space export (the built-in NIfTI "
                "fallback cannot carry the affines applywarp needs)",
                stacklevel=2)

    nifti.save_im_data(maps["oef"], filename + "_oef", transform_directory)
    nifti.save_im_data(maps["dbv"], filename + "_dbv", transform_directory)
    nifti.save_im_data(maps["r2p"], filename + "_r2p", transform_directory)
    # Reference parity: the reference rebinds ``log_stds`` to the
    # 200-sample MC variance maps of (OEF, DBV, R2') before saving
    # (model.py:790 calculate_means(..., return_stds=True), :887), so its
    # ``_logstds`` artifact holds 3-channel sampled variances -- matched
    # here. The raw squashed log-std/offdiag head channels (which the
    # reference computes at model.py:782-786 but then overwrites) are
    # additionally kept under ``_raw_logstds``.
    nifti.save_im_data(maps["stds"], filename + "_logstds",
                       transform_directory)
    nifti.save_im_data(maps["raw_log_stds"], filename + "_raw_logstds",
                       transform_directory)
    return maps
