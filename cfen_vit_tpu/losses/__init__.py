from .gan import gan_loss  # noqa: F401
from .vgg import (vgg19_init, vgg19_features, vgg_perceptual_loss,  # noqa
                  semantic_consistency_loss, idmrf_loss,
                  weights_from_torch_vgg)
