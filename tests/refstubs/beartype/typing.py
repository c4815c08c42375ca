from typing import *  # noqa: F401,F403
from typing import Callable, Iterator  # noqa: F401
