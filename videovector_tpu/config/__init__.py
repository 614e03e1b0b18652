from videovector_tpu.config.textformat import Message, parse, parse_file  # noqa: F401
