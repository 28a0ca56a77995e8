"""Supernet-vs-explicit equivalence: each masked supernet must compute the
exact function of the reference architecture it encodes.  Explicit networks
are built in torch from the same weights (eval mode); torch outputs are
captured as committed goldens (tests/goldens/) so the equivalence asserts
survive a broken torch install."""

import jax
import numpy as np
import pytest
from goldens import oracle

from embracenet_tpu import config as C
from embracenet_tpu.hpo import space
from embracenet_tpu.models import cnn, concatnet, embracenet, ffnn
from embracenet_tpu.ops.convmath import CNN_LENGTHS


def _hp_ffnn(n_layers, widths, dropout=None):
    return {
        "n_layers": np.int32(n_layers),
        "widths": np.asarray(widths, np.int32),
        "dropout": np.asarray(dropout or [0.0] * 4, np.float32),
    }


def _hp_cnn(n_layers, channels, kernels, dropout=None):
    return {
        "n_layers": np.int32(n_layers),
        "channels": np.asarray(channels, np.int32),
        "kernels": np.asarray(kernels, np.int32),
        "dropout": np.asarray(dropout or [0.0] * 4, np.float32),
    }


@pytest.mark.parametrize("n_layers,widths", [
    (1, [128, 16, 4, 4]),
    (2, [256, 64, 4, 4]),
    (4, [32, 128, 64, 16]),
])
def test_ffnn_matches_explicit_mlp(n_layers, widths):
    in_features = 48
    hp = _hp_ffnn(n_layers, widths)
    params = ffnn.init(jax.random.PRNGKey(0), hp, in_features)
    x = np.random.default_rng(0).normal(
        size=(7, in_features)).astype(np.float32)

    def compute():
        # explicit torch MLP with the same (sub-block) weights
        import torch
        import torch.nn as nn

        layers = []
        d_in = in_features
        for i in range(n_layers):
            if i > 0:
                w = np.asarray(params[f"w{i}"])[:widths[i - 1], :widths[i]]
            else:
                w = np.asarray(params[f"w{i}"])[:in_features, :widths[i]]
            b = np.asarray(params[f"b{i}"])[:widths[i]]
            lin = nn.Linear(w.shape[0], w.shape[1])
            lin.weight.data = torch.tensor(w.T)
            lin.bias.data = torch.tensor(b)
            layers += [lin, nn.ReLU()]
            d_in = widths[i]
        head = nn.Linear(d_in, 2)
        head.weight.data = torch.tensor(np.asarray(params["w_head"])[:d_in].T)
        head.bias.data = torch.tensor(np.asarray(params["b_head"]))
        layers.append(head)
        net = nn.Sequential(*layers).eval()
        return {"want": net(torch.tensor(x)).detach().numpy()}

    want = oracle(f"models_ffnn_l{n_layers}_" + "-".join(map(str, widths)),
                  "torch", compute)["want"]
    got = np.asarray(ffnn.apply(params, hp, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_layers,channels,kernels", [
    (1, [32, 32, 64, 128], [5, 5, 5, 5]),
    (2, [16, 96, 64, 128], [11, 15, 5, 5]),
    (3, [64, 32, 128, 256], [15, 5, 11, 15]),
])
def test_cnn_matches_explicit_convnet(n_layers, channels, kernels):
    hp = _hp_cnn(n_layers, channels, kernels)
    params, bn_state = cnn.init(jax.random.PRNGKey(1), hp)
    x = np.random.default_rng(2).normal(size=(5, 4, 256)).astype(np.float32)

    def compute():
        import torch
        import torch.nn as nn

        blocks = []
        c_in = 4
        for i in range(n_layers):
            k = kernels[i]
            lo = (C.CNN_MAX_KERNEL - k) // 2
            w_full = np.asarray(params[f"conv_w{i}"])
            w = w_full[:channels[i], :c_in, lo:lo + k]
            b = np.asarray(params[f"conv_b{i}"])[:channels[i]]
            conv = nn.Conv1d(c_in, channels[i], kernel_size=k,
                             padding=(k - 1) // 2)
            conv.weight.data = torch.tensor(w)
            conv.bias.data = torch.tensor(b)
            bn = nn.BatchNorm1d(channels[i])
            bn.weight.data = torch.tensor(
                np.asarray(params[f"bn{i}"]["scale"])[:channels[i]])
            bn.bias.data = torch.tensor(
                np.asarray(params[f"bn{i}"]["bias"])[:channels[i]])
            bn.running_mean.data = torch.tensor(
                np.asarray(bn_state[f"bn{i}"]["mean"])[:channels[i]])
            bn.running_var.data = torch.tensor(
                np.asarray(bn_state[f"bn{i}"]["var"])[:channels[i]])
            blocks += [conv, bn, nn.ReLU(), nn.MaxPool1d(10, 2)]
            c_in = channels[i]
        flat_size = channels[n_layers - 1] * CNN_LENGTHS[n_layers - 1]
        fc1 = nn.Linear(flat_size, 1000)
        fc1.weight.data = torch.tensor(
            np.asarray(params["w_fc1"])[:flat_size].T)
        fc1.bias.data = torch.tensor(np.asarray(params["b_fc1"]))
        fc2 = nn.Linear(1000, 64)
        fc2.weight.data = torch.tensor(np.asarray(params["w_fc2"]).T)
        fc2.bias.data = torch.tensor(np.asarray(params["b_fc2"]))
        hd = nn.Linear(64, 2)
        hd.weight.data = torch.tensor(np.asarray(params["w_head"]).T)
        hd.bias.data = torch.tensor(np.asarray(params["b_head"]))

        torch_net = nn.Sequential(*blocks).eval()
        h = torch_net(torch.tensor(x))
        h = h.reshape(h.shape[0], -1)
        # linear head, no activations
        return {"want": hd(fc2(fc1(h))).detach().numpy()}

    want = oracle(
        f"models_cnn_l{n_layers}_" + "-".join(map(str, channels))
        + "_k" + "-".join(map(str, kernels)), "torch", compute)["want"]
    got, _ = cnn.apply(params, bn_state, hp, x, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_cnn_flat_mask_matches_reference_output_size():
    for n_layers, channels in [(1, [16, 32, 64, 128]), (3, [64, 96, 256, 512]),
                               (4, [16, 96, 64, 512])]:
        hp = _hp_cnn(n_layers, channels, [5, 11, 15, 5])
        params, bn_state = cnn.init(jax.random.PRNGKey(0), hp, head=False)
        x = np.zeros((2, 4, 256), np.float32)
        _, flat_mask, _ = cnn.features(params, bn_state, hp, x, train=False)
        want = channels[n_layers - 1] * CNN_LENGTHS[n_layers - 1]
        assert int(np.asarray(flat_mask).sum()) == want


def test_embrace_select_extremes():
    b, e = 4, 64
    d0 = np.ones((b, e), np.float32)
    d1 = np.full((b, e), 2.0, np.float32)
    key = jax.random.PRNGKey(0)
    all0 = embracenet.embrace([d0, d1], key,
                              selection_probabilities=np.tile([1.0, 0.0], (b, 1)))
    all1 = embracenet.embrace([d0, d1], key,
                              selection_probabilities=np.tile([0.0, 1.0], (b, 1)))
    np.testing.assert_array_equal(np.asarray(all0), d0)
    np.testing.assert_array_equal(np.asarray(all1), d1)


def test_embrace_availability_overrides_probs():
    b, e = 3, 32
    d0 = np.zeros((b, e), np.float32)
    d1 = np.ones((b, e), np.float32)
    avail = np.tile([0.0, 1.0], (b, 1)).astype(np.float32)
    out = embracenet.embrace([d0, d1], jax.random.PRNGKey(1),
                             availabilities=avail,
                             selection_probabilities=np.tile([0.9, 0.1], (b, 1)))
    np.testing.assert_array_equal(np.asarray(out), d1)


def test_embrace_mixing_fraction():
    b, e = 64, 1024
    d0 = np.zeros((b, e), np.float32)
    d1 = np.ones((b, e), np.float32)
    p = np.tile([0.25, 0.75], (b, 1)).astype(np.float32)
    out = np.asarray(embracenet.embrace([d0, d1], jax.random.PRNGKey(2),
                                        selection_probabilities=p))
    assert out.mean() == pytest.approx(0.75, abs=0.02)


def _multimodal_inputs(rng, b=6, in_ffnn=30):
    x_f = rng.normal(size=(b, in_ffnn)).astype(np.float32)
    x_c = rng.normal(size=(b, 4, 256)).astype(np.float32)
    return x_f, x_c


@pytest.mark.parametrize("model", ["EmbraceNetMultimodal", "ConcatNetMultimodal"])
def test_multimodal_forward_shapes(model, rng):
    params_flat = space.sample_params(model, rng)
    hp = space.params_to_hp(model, params_flat)
    mod = embracenet if model == "EmbraceNetMultimodal" else concatnet
    params, bn_state = mod.init(jax.random.PRNGKey(0), hp, in_features_ffnn=30)
    x_f, x_c = _multimodal_inputs(rng)
    logits, new_bn = mod.apply(params, bn_state, hp, x_f, x_c,
                               train=True, key=jax.random.PRNGKey(3))
    assert np.asarray(logits).shape == (6, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_population_vmap_equals_individual(rng):
    """A vmapped population of FFNN trials must equal per-trial applies."""
    in_features = 20
    n_trials = 4
    hps, ps = [], []
    for t in range(n_trials):
        flat = space.sample_params("FFNN", rng)
        hp = space.params_to_hp("FFNN", flat)
        hps.append(hp)
        ps.append(ffnn.init(jax.random.PRNGKey(t), hp, in_features))
    stack = lambda *xs: np.stack(xs)  # noqa: E731
    hp_stack = jax.tree.map(stack, *hps)
    p_stack = jax.tree.map(stack, *ps)
    x = rng.normal(size=(8, in_features)).astype(np.float32)

    vapply = jax.vmap(lambda p, h: ffnn.apply(p, h, x, train=False))
    got = np.asarray(vapply(p_stack, hp_stack))
    for t in range(n_trials):
        want = np.asarray(ffnn.apply(ps[t], hps[t], x, train=False))
        np.testing.assert_allclose(got[t], want, rtol=2e-4, atol=2e-5)
