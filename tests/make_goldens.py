"""Generate golden-value fixtures from the PyTorch reference.

Runs the reference's GaussianDiffusion math (``/root/reference/text2motion/
models/gaussian_diffusion.py``) on fixed inputs with injected noise and dumps
the results to ``tests/fixtures/diffusion_goldens.npz``. The JAX build is
then tested bit-for-bit (to float32 tolerance) against these fixtures —
SURVEY.md §4's "golden-value parity tests". Run once wherever the reference
tree is mounted; the .npz is committed so CI never needs the reference.

Usage:  python tests/make_goldens.py
"""

import os
import sys

import numpy as np

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference/text2motion")


def main() -> None:
    sys.path.insert(0, REFERENCE)
    import torch
    from models import gaussian_diffusion as gd

    rng = np.random.default_rng(0)
    B, T_SEQ, D = 4, 12, 8
    T_DIFF = 100

    x_start = rng.standard_normal((B, T_SEQ, D)).astype(np.float32)
    noise = rng.standard_normal((B, T_SEQ, D)).astype(np.float32)
    t = np.array([0, 1, 57, 99], dtype=np.int64)
    model_output = rng.standard_normal((B, T_SEQ, D)).astype(np.float32)
    model_output_2x = rng.standard_normal((B, T_SEQ, 2 * D)).astype(np.float32)

    out = {
        "x_start": x_start, "noise": noise, "t": t.astype(np.int32),
        "model_output": model_output, "model_output_2x": model_output_2x,
    }

    for sched_name in ["linear", "cosine", "sqrt"]:
        betas = gd.get_named_beta_schedule(sched_name, T_DIFF)
        out[f"betas_{sched_name}"] = betas
    betas = out["betas_linear"]

    xs = torch.from_numpy(x_start)
    ns = torch.from_numpy(noise)
    tt = torch.from_numpy(t)

    # NOTE: the reference's LEARNED/LEARNED_RANGE paths split the model
    # output on dim=1 (an image-era leftover; for [B,T,D] motion tensors that
    # splits TIME, and the path is dead in the live FIXED_SMALL config,
    # gaussian_diffusion.py:495-508 / trainers/ddpm_trainer.py:43-50). Our
    # build splits on the feature axis; those paths are covered by internal
    # consistency tests instead of goldens.
    for mean_name, mean_type in [("eps", gd.ModelMeanType.EPSILON),
                                 ("x0", gd.ModelMeanType.START_X),
                                 ("xprev", gd.ModelMeanType.PREVIOUS_X)]:
        for var_name, var_type in [("small", gd.ModelVarType.FIXED_SMALL),
                                   ("large", gd.ModelVarType.FIXED_LARGE)]:
            diff = gd.GaussianDiffusion(
                betas=betas, model_mean_type=mean_type,
                model_var_type=var_type, loss_type=gd.LossType.MSE)
            mo = model_output
            model = lambda x, tb, **kw: torch.from_numpy(mo)
            x_t = diff.q_sample(xs, tt, noise=ns)
            pmv = diff.p_mean_variance(model, x_t, tt, clip_denoised=False)
            key = f"{mean_name}_{var_name}"
            out[f"pmv_mean_{key}"] = pmv["mean"].numpy()
            out[f"pmv_logvar_{key}"] = pmv["log_variance"].numpy()
            out[f"pmv_xstart_{key}"] = pmv["pred_xstart"].numpy()

    diff = gd.GaussianDiffusion(
        betas=betas, model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL, loss_type=gd.LossType.MSE)

    out["q_sample"] = diff.q_sample(xs, tt, noise=ns).numpy()
    qm, qv, qlv = diff.q_mean_variance(xs, tt)
    out["q_mean"], out["q_var"], out["q_logvar"] = qm.numpy(), qv.numpy(), qlv.numpy()
    pm, pv, plv = diff.q_posterior_mean_variance(xs, torch.from_numpy(model_output), tt)
    out["qpost_mean"], out["qpost_var"], out["qpost_logvar"] = (
        pm.numpy(), pv.numpy(), plv.numpy())

    # training_losses with injected noise (MSE / eps path)
    class _M:
        def __call__(self, x, tb, **kw):
            return torch.from_numpy(model_output)

        @staticmethod
        def reset_all_moe_counters(model):
            pass

        @staticmethod
        def get_moe_loss(model):
            return 0.0

    terms = diff.training_losses(_M(), xs, tt, model_kwargs={}, noise=ns)
    out["tl_mse"] = terms["mse"].detach().numpy()
    out["tl_target"] = terms["target"].detach().numpy()

    # one DDIM step (eta=0 and eta=0.5, t=57) with zero added noise
    x_t = diff.q_sample(xs, tt, noise=ns)
    real_randn = torch.randn_like
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        for eta in (0.0, 0.5):
            dd = diff.ddim_sample(_M(), x_t, tt, clip_denoised=False, eta=eta)
            out[f"ddim_sample_eta{eta}"] = dd["sample"].numpy()
        # one CFG p_sample step: cond output = model_output, uncond = 0.5*it
        cond = torch.from_numpy(model_output)
        uncond = cond * 0.5

        class _CFGModel:
            def __init__(self):
                self.calls = 0
            def __call__(self, x, tb, **kw):
                self.calls += 1
                return cond if kw.get("xf_proj") is not None or kw.get("text", [""])[0] else uncond

        m = _CFGModel()
        cfg = diff.p_sample_with_cfg(
            m, x_t, tt, clip_denoised=False,
            model_kwargs={"text": ["a"] * B, "xf_proj": torch.zeros(1), "xf_out": torch.zeros(1)},
            cfg_scale=7.5)
        out["cfg_sample"] = cfg["sample"].numpy()
        out["cfg_xstart"] = cfg["pred_xstart"].numpy()
    finally:
        torch.randn_like = real_randn

    path = os.path.join(os.path.dirname(__file__), "fixtures", "diffusion_goldens.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} with {len(out)} arrays")


if __name__ == "__main__":
    main()
