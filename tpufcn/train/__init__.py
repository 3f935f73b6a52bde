from tpufcn.train.losses import detectnet_loss, seg_loss, l1_loss_caffe, euclidean_loss_caffe
from tpufcn.train.step import TrainState, make_train_step, make_optimizer

__all__ = [
    "detectnet_loss", "seg_loss", "l1_loss_caffe", "euclidean_loss_caffe",
    "TrainState", "make_train_step", "make_optimizer",
]
