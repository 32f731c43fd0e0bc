"""Common utilities: spatial math, logging, meters, pytree helpers.

TPU-native rebuild of the reference's ``deeplio/common/`` layer
(``spatial.py``, ``logger.py``, ``utils.py`` — see SURVEY.md §2.1).
"""

from deeplio_tpu.utils.logger import get_app_logger
from deeplio_tpu.utils.meters import AverageMeter
