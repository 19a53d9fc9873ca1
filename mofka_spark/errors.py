"""Error types mirroring the reference's observable failure modes.

Reference parity:
- duplicate topic -> "Topic already exists"
  (/root/reference/src/MofkaDriver.cpp:258-261, tests/MofkaDriverTest.cpp:41)
- open of missing topic fails (/root/reference/tests/MofkaDriverTest.cpp:55)
- invalid events rejected at produce time
  (/root/reference/src/MofkaProducer.cpp:68-69)
"""


class MofkaError(Exception):
    """Base class for mofka_spark errors."""


class TopicExistsError(MofkaError):
    """Raised by create_topic when the topic already exists."""


class TopicNotFoundError(MofkaError):
    """Raised by open_topic when the topic does not exist."""


class ValidationError(MofkaError):
    """Raised when a pushed event fails its topic's validator."""


class InvalidViewError(MofkaError):
    """Raised when a data-view descriptor is malformed (negative offset,
    size overflow, ...)."""
