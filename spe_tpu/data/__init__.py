from spe_tpu.data.build import build_dataset  # noqa: F401
