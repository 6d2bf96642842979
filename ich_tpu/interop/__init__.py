"""Interop: import reference (torch) checkpoints into ich_tpu variables.

`torch_port` converts reference ``state_dict``s (as plain numpy mappings —
no torch dependency in the framework) into flax variable trees for the
matching ich_tpu network, enabling users of the reference codebase to carry
trained weights across. Also the basis of the weight-ported forward-parity
test suite (``tests/test_network_parity.py``).
"""

from ich_tpu.interop.torch_port import (  # noqa: F401
    port_ae,
    port_fcdd,
    port_gated_generator,
    port_resnet,
    port_unet,
    port_unet_encoder,
    port_partial_unet,
)
