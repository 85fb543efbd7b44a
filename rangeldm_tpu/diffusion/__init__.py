from rangeldm_tpu.diffusion.schedule import Schedule, ScheduleConfig  # noqa: F401
