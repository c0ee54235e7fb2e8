from mmtrack_tpu.utils.env import EnvironmentSettings, create_default_local_file, load_env_settings
from mmtrack_tpu.utils.logging import MetricLogger
from mmtrack_tpu.utils.profiling import Timer, trace_profile
