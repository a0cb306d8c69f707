from tpusparse.formats.csr import CsrMatrix  # noqa: F401
from tpusparse.formats.ell import EllMatrix  # noqa: F401
from tpusparse.formats.bell import BellMatrix  # noqa: F401
