"""long_video_gan_tpu.parallel"""
