from .resnet import (ResnetValueNet, build_model, count_params, forward_eval,
                     forward_train, init_variables)

__all__ = ["ResnetValueNet", "build_model", "count_params", "forward_eval",
           "forward_train", "init_variables"]
