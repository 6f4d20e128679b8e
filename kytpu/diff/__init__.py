from kytpu.diff.params import get_params, set_params, TRAINABLE
from kytpu.diff.losses import mse, relmse, l1
from kytpu.diff.inverse import render_loss, make_train_step, recover
from kytpu.diff.fd_check import fd_gradient, check_gradients

__all__ = ["get_params", "set_params", "TRAINABLE", "mse", "relmse", "l1",
           "render_loss", "make_train_step", "recover", "fd_gradient",
           "check_gradients"]
