from spe_tpu.models.build import build_model  # noqa: F401
