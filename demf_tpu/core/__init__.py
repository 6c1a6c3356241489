from . import boxes
from .coders import ClassAgnosticBBoxCoder, DeMFClassAgnosticBBoxCoder
