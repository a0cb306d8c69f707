from tpusparse.kernels.dense import dense_xla, dense_pallas  # noqa: F401
