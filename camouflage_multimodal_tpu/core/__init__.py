from camouflage_multimodal_tpu.core.config import load_config, default_config  # noqa: F401
