from v2ap_tpu.pipelines.generate import V2APipeline, bucket_length  # noqa: F401
