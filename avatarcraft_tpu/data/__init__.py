from avatarcraft_tpu.data.smpl_dataset import SMPLMultiviewDataset

__all__ = ["SMPLMultiviewDataset"]
