from gantron_tpu.models.discriminator import (Discriminator,
                                              LinearDiscriminator,
                                              make_discriminator)
from gantron_tpu.models.tacotron2 import Tacotron2

__all__ = ["Tacotron2", "Discriminator", "LinearDiscriminator",
           "make_discriminator"]
