"""Loss / optimizer equivalence against torch oracles.

Oracle calls go through ``goldens.oracle``: live torch when importable,
committed ``tests/goldens/*.npz`` fixtures when the install is broken
(this VM has shipped disk-corrupted torch before)."""

import numpy as np
import pytest
from goldens import oracle

from embracenet_tpu.ops import losses, optim


@pytest.mark.parametrize("seed", range(4))
def test_weighted_ce_matches_torch(seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(32, 2)).astype(np.float32)
    target = (rng.random(32) < 0.3).astype(np.int64)
    target[0] = 1
    target[1] = 0

    w_pos, w_neg = losses.ins_weights(np.asarray(target))

    def compute():
        import torch

        crit = torch.nn.CrossEntropyLoss(
            weight=torch.tensor([float(w_neg), float(w_pos)]))
        return {"want": crit(torch.tensor(logits),
                             torch.tensor(target)).item()}

    want = float(oracle(f"losses_ce_seed{seed}", "torch", compute)["want"])
    got = float(losses.weighted_cross_entropy(logits, target))
    assert got == pytest.approx(want, rel=1e-5)


def test_weighted_ce_mask_equals_trimmed():
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(20, 2)).astype(np.float32)
    target = (rng.random(20) < 0.5).astype(np.int64)
    mask = np.concatenate([np.ones(13), np.zeros(7)])
    got = float(losses.weighted_cross_entropy(logits, target, mask))
    want = float(losses.weighted_cross_entropy(logits[:13], target[:13]))
    assert got == pytest.approx(want, rel=1e-6)


def _run_torch_opt(make_opt, params0, grads):
    import torch

    p = torch.nn.Parameter(torch.tensor(params0))
    opt = make_opt(torch, [p])
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    return p.detach().numpy()


def _run_ours(opt_id, lr, wd, params0, grads):
    params = {"w": np.asarray(params0)}
    state = optim.init_state(params)
    for g in grads:
        params, state = optim.apply_update(
            params, {"w": np.asarray(g)}, state, opt_id, lr, wd)
    return np.asarray(params["w"])


@pytest.mark.parametrize("name,opt_id", [("Adam", optim.ADAM),
                                         ("RMSprop", optim.RMSPROP)])
def test_optimizers_match_torch(name, opt_id):
    rng = np.random.default_rng(0)
    params0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(7)]
    lr, wd = 1e-2, 1e-3

    def compute():
        def make(torch, ps):
            cls = torch.optim.Adam if name == "Adam" else torch.optim.RMSprop
            return cls(ps, lr=lr, weight_decay=wd)

        return {"want": _run_torch_opt(make, params0, grads)}

    want = oracle(f"optim_{name}", "torch", compute)["want"]
    got = _run_ours(opt_id, lr, wd, params0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_nadam_matches_torch_nadam():
    # timm's legacy Nadam == torch.optim.NAdam with momentum_decay=4e-3
    rng = np.random.default_rng(1)
    params0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(7)]
    lr, wd = 1e-2, 1e-3

    def compute():
        return {"want": _run_torch_opt(
            lambda torch, ps: torch.optim.NAdam(ps, lr=lr, weight_decay=wd,
                                                momentum_decay=4e-3),
            params0, grads)}

    want = oracle("optim_NAdam", "torch", compute)["want"]
    got = _run_ours(optim.NADAM, lr, wd, params0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
