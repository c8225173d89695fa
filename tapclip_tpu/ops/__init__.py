"""tapclip_tpu.ops"""
