"""Import-only shim: the reference imports botorch (`training_models.py:20`)
but, in the 3-trial regime, BoTorchSampler never leaves random startup."""
