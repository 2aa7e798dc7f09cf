from msc_tpu.training.train import TrainState, make_train_step, caption_loss

__all__ = ["TrainState", "make_train_step", "caption_loss"]
