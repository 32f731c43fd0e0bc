from deeplio_tpu.eval.metrics import ate, kitti_odometry_errors, rpe
from deeplio_tpu.eval.streaming import StreamingOdometry
from deeplio_tpu.eval.runner import evaluate_drive, predict_drive
from deeplio_tpu.eval.trajectory import (
    chain_relative,
    chain_relative_np,
    gt_trajectory,
    read_kitti_poses,
    write_kitti_poses,
)
