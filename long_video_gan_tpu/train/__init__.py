"""long_video_gan_tpu.train"""
