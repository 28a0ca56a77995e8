"""timm.optim shim: the reference uses only timm.optim.Nadam
(`models/utils/optim/__init__.py:2`, `training_models.py:274`).  torch's
built-in NAdam implements the same Nesterov-Adam update (modulo timm's
legacy schedule constants) and takes the same (params, lr, weight_decay)
construction, so it stands in directly."""

from torch.optim import NAdam as Nadam  # noqa: F401
