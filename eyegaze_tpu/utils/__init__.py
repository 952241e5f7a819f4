"""Utils: run logging + MATLAB-compatible CSV export contract."""

from eyegaze_tpu.utils.logging import RunLogger
from eyegaze_tpu.utils import io_csv
