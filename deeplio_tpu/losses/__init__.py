from deeplio_tpu.losses.pose import init_loss_params, pose_loss
