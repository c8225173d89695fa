"""tapclip_tpu.data"""
