from .pose_ba import refine_poses, apply_pose, pose_residual_stats

__all__ = ["refine_poses", "apply_pose", "pose_residual_stats"]
