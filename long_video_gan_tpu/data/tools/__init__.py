"""long_video_gan_tpu.data.tools"""
