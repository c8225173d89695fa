"""tapclip_tpu.parallel"""
