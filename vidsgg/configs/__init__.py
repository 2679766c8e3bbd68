from vidsgg.configs.tempura import TempuraRunConfig  # noqa: F401
from vidsgg.configs.teatgt import TeatGTRunConfig  # noqa: F401
