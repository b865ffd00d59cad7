"""Method-trainer registry (parity with the reference imports at
``train.py:28-34``)."""

from federated_multi_modal_tpu.trainers import coop  # noqa: F401
from federated_multi_modal_tpu.trainers import zsclip  # noqa: F401

try:  # trainers are added incrementally during the build
    from federated_multi_modal_tpu.trainers import cocoop  # noqa: F401
except ImportError:
    pass
try:
    from federated_multi_modal_tpu.trainers import vpt  # noqa: F401
except ImportError:
    pass
try:
    from federated_multi_modal_tpu.trainers import ivlp  # noqa: F401
except ImportError:
    pass
try:
    from federated_multi_modal_tpu.trainers import maple  # noqa: F401
except ImportError:
    pass
try:
    from federated_multi_modal_tpu.trainers import maple_fed  # noqa: F401
except ImportError:
    pass
