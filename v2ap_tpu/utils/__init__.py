from v2ap_tpu.utils.jitting import create_model, enable_compile_cache  # noqa: F401
