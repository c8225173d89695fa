"""tapclip_tpu.models"""
