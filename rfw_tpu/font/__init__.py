from rfw_tpu.font.plugin import FontPlugin, Section, Text
