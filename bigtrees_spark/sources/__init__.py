"""Sources & sinks: synthetic web_pages fixture generation, readers/writers."""
