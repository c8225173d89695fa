"""tapclip_tpu.utils"""
