"""Import-only shim: miceforest is used by the reference's preprocessing
(MICE, `data_pipe/utils.py:32`), which the parity harness bypasses — it
feeds already-preprocessed feature matrices to both sides."""


class KernelDataSet:
    def __init__(self, *args, **kwargs):
        raise RuntimeError("miceforest shim: MICE imputation is not "
                           "available in the parity harness")
