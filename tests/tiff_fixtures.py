"""Embedded TIFF known-answer vectors (generated — do not edit).

Regenerate: PYTHONPATH=/root/repo python scripts/make_tiff_fixtures.py
Author: the JDK javax.imageio TIFF writer (see the generator
docstring).  pixels are the original (= expected lossless
decode) samples; 16-bit vectors expect the >>8 narrowing."""

import base64

VECTORS = {
    'gray16_lzw': {
        'size': (21, 13),
        'channels': 1,
        'provenance': 'JDK javax.imageio TIFF writer, type=gray16, compression=LZW',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADQEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAABABAAAAED'
            'AAMAAAABAAUAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAvAEVAAMAAAABAAEAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAA4QEaAAUAAAABAAAArAEbAAUAAAABAAAAtAEo'
            'AAMAAAABAAEAAAFTAAMAAAABAAEAAAAAAAAAAQAAAAEAAAABAAAAAQAAAAGAAiBQ'
            'OBBiDQeDCiFQuFDiHQ+HEiJROJFgsQSCQiEQyGRCIRSKRaMQONQeOQuPQ+QROLBG'
            'XS+XCGZTOZDGbTebEGdTudFGfT+fGEwzCYTSaTicTyeUCgUKiS+jTOkTelTumT+h'
            'BqtVutCqvV+vDqxWOxEqzWezFq1Wu1Go1VyuWCwWSyWi0Wy2W64Vu5V+6WO7We8W'
            'u3CPDYfDDPFYvFEPHY/HFPJZPJGPLZfLHM54jEYzGZDIZTKZjMZrOYfPYvQY/RZP'
            'SZfNCzZbPZDzbbfbEzdbvdFzfb/fGzhcPhHw+QEgMDAwMDAwMDBAQEBAQEBAQFBQ'
            'UFBQUFBQYGAZGRkZGRkZGSkpKSkpKSkpOTk5OTk5OTlJSUlJSUlJSVlZWVlZWVlZ'
            'aWkZGRkZGRkZGSkpKSkpKSkpOTk5OTk5OTlJSUlJSUlJSVlZWVlZWVlZaWkZGRkZ'
            'GRkZGSkpKSkpKSkpOTk5OTk5OTlJSUlJSUlJSVlZWVlZWVlZaWkiIiIiIiIiIjIy'
            'MjIyMjIyQkJCQkJCQkJSUlJSUlJSUmJiYmJiYmJicnIiIiIiIiIiIjIyMjIyMjIy'
            'QkJCQkJCQkJSUlJSUlJSUmJiYmJiYmJicnIiIiIiIiIiIjIyMjIyMjIyQkJCQkJC'
            'QkJSUlJSUlJSUmJiYmJiYmJicnIrKysrKysrKzs7Ozs7Ozs7S0tLS0tLS0tbW1tb'
            'W1tbW2tra2tra2tre3t5hIKNmKOhrLfCwMvW4d/q9QD+CRQfHSgzPjxHUl1bZnF8'
            'eoWQm5mkr7q4w87Z1+Lt+HyHkp2bprG8usXQ29nk7/r4Aw4ZFyItODZBTFdVYGt2'
            'dH+KlZOeqbSyvcjT0dzn8vD7BhEPGiUwLjlET01YY25sd4KNi5ahrKq1wMvJ1N/q'
            '6PP+CY2Yo66st8LNy9bh7Or1AAsJFB8qKDM+SUdSXWhmcXyHhZCbpqSvusXDztnk'
            '4u34AwEMFyIgKzZBP0pVYF5pdH99iJOenKeyvbvG0dza5fD7+QQPGp6ptL+9yNPe'
            '3Ofy/fsGERwaJTA7OURPWlhjbnl3go2YlqGst7XAy9bU3+r18/4JFBIdKDMxPEdS'
            'UFtmcW96hZCOmaSvrbjDzszX4u3r9gEMChUgK6+6xdDO2eTv7fgDDgwXIi0rNkFM'
            'SlVga2l0f4qIk56pp7K9yMbR3Ofl8PsGBA8aJSMuOURCTVhjYWx3goCLlqGfqrXA'
            'vsnU393o8/78BxIdGyYxPMDL1uHf6vUA/gkUHx0oMz48R1JdW2ZxfHqFkJuZpK+6'
            'uMPO2dfi7fj2AQwXFSArNjQ/SlVTXml0cn2Ik5Gcp7Kwu8bRz9rl8O75BA8NGCMu'
            'LDdCTdHc5/Lw+wYRDxolMC45RE9NWGNubHeCjYuWoayqtcDLydTf6ujz/gkHEh0o'
            'JjE8R0VQW2Zkb3qFg46ZpKKtuMPBzNfi4Ov2Af8KFSAeKTQ/PUhTXg=='
        ),
        'pixels': base64.b64decode(
            'CAgICBgYGBgoKCgoODg4OEhISEhYCAgICBgYGBgoKCgoODg4OEhISEhYCAgICBgY'
            'GBgoKCgoODg4OEhISEhYERERESEhISExMTExQUFBQVFRUVFhERERESEhISExMTEx'
            'QUFBQVFRUVFhERERESEhISExMTExQUFBQVFRUVFhGhoaGioqKio6Ojo6SkpKSlpa'
            'WlpqGhoaGioqKio6Ojo6SkpKSlpaWlpqGhoaGioqKio6Ojo6SkpKSlpaWlpqIyMj'
            'IzMzMzNDQ0NDU1NTU2NjY2NzIyMjIzMzMzNDQ0NDU1NTU2NjY2NzIyMjIzMzMzND'
            'Q0NDU1NTU2NjY2NzLCwsLDw8PDxMTExMXFxcXGxsbGx8'
        ),
    },
    'gray16_none': {
        'size': (21, 13),
        'channels': 1,
        'provenance': 'JDK javax.imageio TIFF writer, type=gray16, compression=None',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADQEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAABABAAAAED'
            'AAMAAAABAAEAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAvAEVAAMAAAABAAEAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAACIgEaAAUAAAABAAAArAEbAAUAAAABAAAAtAEo'
            'AAMAAAABAAEAAAFTAAMAAAABAAEAAAAAAAAAAQAAAAEAAAABAAAAAQAAAAEHBwcH'
            'BwcHBxcXFxcXFxcXJycnJycnJyc3Nzc3Nzc3N0dHR0dHR0dHV1cHBwcHBwcHBxcX'
            'FxcXFxcXJycnJycnJyc3Nzc3Nzc3N0dHR0dHR0dHV1cHBwcHBwcHBxcXFxcXFxcX'
            'JycnJycnJyc3Nzc3Nzc3N0dHR0dHR0dHV1cQEBAQEBAQECAgICAgICAgMDAwMDAw'
            'MDBAQEBAQEBAQFBQUFBQUFBQYGAQEBAQEBAQECAgICAgICAgMDAwMDAwMDBAQEBA'
            'QEBAQFBQUFBQUFBQYGAQEBAQEBAQECAgICAgICAgMDAwMDAwMDBAQEBAQEBAQFBQ'
            'UFBQUFBQYGAZGRkZGRkZGSkpKSkpKSkpOTk5OTk5OTlJSUlJSUlJSVlZWVlZWVlZ'
            'aWkZGRkZGRkZGSkpKSkpKSkpOTk5OTk5OTlJSUlJSUlJSVlZWVlZWVlZaWkZGRkZ'
            'GRkZGSkpKSkpKSkpOTk5OTk5OTlJSUlJSUlJSVlZWVlZWVlZaWkiIiIiIiIiIjIy'
            'MjIyMjIyQkJCQkJCQkJSUlJSUlJSUmJiYmJiYmJicnIiIiIiIiIiIjIyMjIyMjIy'
            'QkJCQkJCQkJSUlJSUlJSUmJiYmJiYmJicnIiIiIiIiIiIjIyMjIyMjIyQkJCQkJC'
            'QkJSUlJSUlJSUmJiYmJiYmJicnIrKysrKysrKzs7Ozs7Ozs7S0tLS0tLS0tbW1tb'
            'W1tbW2tra2tra2tre3t5hIKNmKOhrLfCwMvW4d/q9QD+CRQfHSgzPjxHUl1bZnF8'
            'eoWQm5mkr7q4w87Z1+Lt+HyHkp2bprG8usXQ29nk7/r4Aw4ZFyItODZBTFdVYGt2'
            'dH+KlZOeqbSyvcjT0dzn8vD7BhEPGiUwLjlET01YY25sd4KNi5ahrKq1wMvJ1N/q'
            '6PP+CY2Yo66st8LNy9bh7Or1AAsJFB8qKDM+SUdSXWhmcXyHhZCbpqSvusXDztnk'
            '4u34AwEMFyIgKzZBP0pVYF5pdH99iJOenKeyvbvG0dza5fD7+QQPGp6ptL+9yNPe'
            '3Ofy/fsGERwaJTA7OURPWlhjbnl3go2YlqGst7XAy9bU3+r18/4JFBIdKDMxPEdS'
            'UFtmcW96hZCOmaSvrbjDzszX4u3r9gEMChUgK6+6xdDO2eTv7fgDDgwXIi0rNkFM'
            'SlVga2l0f4qIk56pp7K9yMbR3Ofl8PsGBA8aJSMuOURCTVhjYWx3goCLlqGfqrXA'
            'vsnU393o8/78BxIdGyYxPMDL1uHf6vUA/gkUHx0oMz48R1JdW2ZxfHqFkJuZpK+6'
            'uMPO2dfi7fj2AQwXFSArNjQ/SlVTXml0cn2Ik5Gcp7Kwu8bRz9rl8O75BA8NGCMu'
            'LDdCTdHc5/Lw+wYRDxolMC45RE9NWGNubHeCjYuWoayqtcDLydTf6ujz/gkHEh0o'
            'JjE8R0VQW2Zkb3qFg46ZpKKtuMPBzNfi4Ov2Af8KFSAeKTQ/PUhTXg=='
        ),
        'pixels': base64.b64decode(
            'BwcHBxcXFxcnJycnNzc3N0dHR0dXBwcHBxcXFxcnJycnNzc3N0dHR0dXBwcHBxcX'
            'FxcnJycnNzc3N0dHR0dXEBAQECAgICAwMDAwQEBAQFBQUFBgEBAQECAgICAwMDAw'
            'QEBAQFBQUFBgEBAQECAgICAwMDAwQEBAQFBQUFBgGRkZGSkpKSk5OTk5SUlJSVlZ'
            'WVlpGRkZGSkpKSk5OTk5SUlJSVlZWVlpGRkZGSkpKSk5OTk5SUlJSVlZWVlpIiIi'
            'IjIyMjJCQkJCUlJSUmJiYmJyIiIiIjIyMjJCQkJCUlJSUmJiYmJyIiIiIjIyMjJC'
            'QkJCUlJSUmJiYmJyKysrKzs7OztLS0tLW1tbW2tra2t7'
        ),
    },
    'gray_deflate': {
        'size': (21, 13),
        'channels': 1,
        'provenance': 'JDK javax.imageio TIFF writer, type=gray, compression=Deflate',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAABAAgAAAED'
            'AAMAAAABgLIAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAAUQEaAAUAAAABAAAAoAEbAAUAAAABAAAAqAEo'
            'AAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAF42o3IoQqDYBgAQPiqTWxi'
            'EbGIZYhFVoZYxCJiGWtjbdXn9x7hv3gRETk1D17skZwZJR0TK+/0LGgYmDn4pmdF'
            'z5OND//0bBlZOPlx3SxcNvHDaFMYpRZrG6ROZFS54DBoXKdUKfUQ4RDZVavVqwLC'
            'ofK5Xq7Xx4ZEZY7LZLMTDonLVbLXbS4hFZUbpU6fWLxWqtX75Ya7ZsBaLJbcJb7X'
            'cbndqli7zWcdfbBkcDZ8phbdl8QFR6Zc1nM3nRKTTrodHotINS6hdRqtTqyKbUrr'
            '9jsNkVT6pdtuNvuTKjVrneBn83pOJptFq+RrdTsuZtNhuehu9vvd/ws91+Lpe1yd'
            'Z3ebs/B0d14+oHiMbvN6PP6RcVj97ff7vgPjMjvp9vr9ycdk9+/6/j/C8QxXQFAk'
            'BwKNxLF89MGPW874Qg+T3PvCj8vq/0MQA/kCw5A8BwTBcHPVEcIvjE0KvxFMMv/F'
            'kOwNF8QBOJ47xlGkZxqG4vkPHMdx1HgjjeS8gSFIMhiuP5TyPJMkSUM5HlvJ0oSf'
            'KI7k+Y6AgA=='
        ),
        'pixels': base64.b64decode(
            'AgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhIS'
            'EhIiIiIiMjIyMkJCQkJSCwsLCxsbGxsrKysrOzs7O0tLS0tbCwsLCxsbGxsrKysr'
            'Ozs7O0tLS0tbCwsLCxsbGxsrKysrOzs7O0tLS0tbFBQUFCQkJCQ0NDQ0RERERFRU'
            'VFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkHR0d'
            'HS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09'
            'PT09TU1NTV1dXV1tJiYmJjY2NjZGRkZGVlZWVmZmZmZ2'
        ),
    },
    'gray_lzw': {
        'size': (21, 13),
        'channels': 1,
        'provenance': 'JDK javax.imageio TIFF writer, type=gray, compression=LZW',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAABAAgAAAED'
            'AAMAAAABAAUAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAApQEaAAUAAAABAAAAoAEbAAUAAAABAAAAqAEo'
            'AAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAGAAKBAIJQUJCKECIZQsZEK'
            'HEIpQOCQaEwqGQ+IRKDQeEwyGw8pAuRAsNyUNiuUCsdysdkuXEstyOSSaUyqWS+Y'
            'TKTSeUyyWy8thShBQSUUSDSkDQiUsiFSnFQyUOiUak0qmU+oVKjUek0ym08yB2xB'
            '0W2UWj20D0m2sml23F022OyWa02q2W+4XKzWe02y2282ibBCYbYUbEbEEYrYsrGb'
            'HGY7QEBTU2MTExMTIyMjIzMzMzNDQ0NDU1NTU2McHBwcLCwsLDw8PDxMTExMXFxc'
            'XGwcHBwcLCwsLDw8PDxMTExMXFxcXGwcHBwcLCwsLDw8PDxMTExMXFxcXGwlJSUl'
            'NTU1NUVFRUVVVVVVZWVlZXU='
        ),
        'pixels': base64.b64decode(
            'AgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhIS'
            'EhIiIiIiMjIyMkJCQkJSCwsLCxsbGxsrKysrOzs7O0tLS0tbCwsLCxsbGxsrKysr'
            'Ozs7O0tLS0tbCwsLCxsbGxsrKysrOzs7O0tLS0tbFBQUFCQkJCQ0NDQ0RERERFRU'
            'VFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkHR0d'
            'HS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09'
            'PT09TU1NTV1dXV1tJiYmJjY2NjZGRkZGVlZWVmZmZmZ2'
        ),
    },
    'gray_none': {
        'size': (21, 13),
        'channels': 1,
        'provenance': 'JDK javax.imageio TIFF writer, type=gray, compression=None',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAABAAgAAAED'
            'AAMAAAABAAEAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAABEQEaAAUAAAABAAAAoAEbAAUAAAABAAAAqAEo'
            'AAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAEBAQEBERERESEhISExMTEx'
            'QUFBQVEBAQEBERERESEhISExMTExQUFBQVEBAQEBERERESEhISExMTExQUFBQVEK'
            'CgoKGhoaGioqKio6Ojo6SkpKSloKCgoKGhoaGioqKio6Ojo6SkpKSloKCgoKGhoa'
            'GioqKio6Ojo6SkpKSloTExMTIyMjIzMzMzNDQ0NDU1NTU2MTExMTIyMjIzMzMzND'
            'Q0NDU1NTU2MTExMTIyMjIzMzMzNDQ0NDU1NTU2McHBwcLCwsLDw8PDxMTExMXFxc'
            'XGwcHBwcLCwsLDw8PDxMTExMXFxcXGwcHBwcLCwsLDw8PDxMTExMXFxcXGwlJSUl'
            'NTU1NUVFRUVVVVVVZWVlZXU='
        ),
        'pixels': base64.b64decode(
            'AQEBAREREREhISEhMTExMUFBQUFRAQEBAREREREhISEhMTExMUFBQUFRAQEBARER'
            'EREhISEhMTExMUFBQUFRCgoKChoaGhoqKioqOjo6OkpKSkpaCgoKChoaGhoqKioq'
            'Ojo6OkpKSkpaCgoKChoaGhoqKioqOjo6OkpKSkpaExMTEyMjIyMzMzMzQ0NDQ1NT'
            'U1NjExMTEyMjIyMzMzMzQ0NDQ1NTU1NjExMTEyMjIyMzMzMzQ0NDQ1NTU1NjHBwc'
            'HCwsLCw8PDw8TExMTFxcXFxsHBwcHCwsLCw8PDw8TExMTFxcXFxsHBwcHCwsLCw8'
            'PDw8TExMTFxcXFxsJSUlJTU1NTVFRUVFVVVVVWVlZWV1'
        ),
    },
    'gray_packbits': {
        'size': (21, 13),
        'channels': 1,
        'provenance': 'JDK javax.imageio TIFF writer, type=gray, compression=PackBits',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAABAAgAAAED'
            'AAMAAAABgAUAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAAnAEaAAUAAAABAAAAoAEbAAUAAAABAAAAqAEo'
            'AAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAH9Av0S/SL9Mv1CAFL9Av0S'
            '/SL9Mv1CAFL9Av0S/SL9Mv1CAFL9C/0b/Sv9O/1LAFv9C/0b/Sv9O/1LAFv9C/0b'
            '/Sv9O/1LAFv9FP0k/TT9RP1UAGT9FP0k/TT9RP1UAGT9FP0k/TT9RP1UAGT9Hf0t'
            '/T39Tf1dAG39Hf0t/T39Tf1dAG39Hf0t/T39Tf1dAG39Jv02/Ub9Vv1mAHYoC77X'
            'cbndqli7zWcdfbBkcDZ8phbdl8QFR6Zc1nM3nRKTTrodHotINS6hdRqtTqyKbUrr'
            '9jsNkVT6pdtuNvuTKjVrneBn83pOJptFq+RrdTsuZtNhuehu9vvd/ws91+Lpe1yd'
            'Z3ebs/B0d14+oHiMbvN6PP6RcVj97ff7vgPjMjvp9vr9ycdk9+/6/j/C8QxXQFAk'
            'BwKNxLF89MGPW874Qg+T3PvCj8vq/0MQA/kCw5A8BwTBcHPVEcIvjE0KvxFMMv/F'
            'kOwNF8QBOJ47xlGkZxqG4vkPHMdx1HgjjeS8gSFIMhiuP5TyPJMkSUM5HlvJ0oSf'
            'KI7k+Y6AgA=='
        ),
        'pixels': base64.b64decode(
            'AgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhIS'
            'EhIiIiIiMjIyMkJCQkJSCwsLCxsbGxsrKysrOzs7O0tLS0tbCwsLCxsbGxsrKysr'
            'Ozs7O0tLS0tbCwsLCxsbGxsrKysrOzs7O0tLS0tbFBQUFCQkJCQ0NDQ0RERERFRU'
            'VFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkHR0d'
            'HS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09'
            'PT09TU1NTV1dXV1tJiYmJjY2NjZGRkZGVlZWVmZmZmZ2'
        ),
    },
    'gray_zlib': {
        'size': (21, 13),
        'channels': 1,
        'provenance': 'JDK javax.imageio TIFF writer, type=gray, compression=ZLib',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAABAAgAAAED'
            'AAMAAAABAAgAAAEGAAMAAAABAAEAAAERAAQAAAABAAAAsAEVAAMAAAABAAEAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAAUQEaAAUAAAABAAAAoAEbAAUAAAABAAAAqAEo'
            'AAMAAAABAAEAAAAAAAAAAAAAAAEAAAABAAAAAQAAAAF42o3IoQqDYBgAQPiqTWxi'
            'EbGIZYhFVoZYxCJiGWtjbdXn9x7hv3gRETk1D17skZwZJR0TK+/0LGgYmDn4pmdF'
            'z5OND//0bBlZOPlx3SxcNvHhyDV3KhyF1i6Fo9TerQOrXc4tD470wurgyC6tD478'
            'yubBUVzbOjjKm7ZvYLWr+5fDkXl8Oxy550+Ho/D65XCU3r8djsrnHwcAreIoC77X'
            'cbndqli7zWcdfbBkcDZ8phbdl8QFR6Zc1nM3nRKTTrodHotINS6hdRqtTqyKbUrr'
            '9jsNkVT6pdtuNvuTKjVrneBn83pOJptFq+RrdTsuZtNhuehu9vvd/ws91+Lpe1yd'
            'Z3ebs/B0d14+oHiMbvN6PP6RcVj97ff7vgPjMjvp9vr9ycdk9+/6/j/C8QxXQFAk'
            'BwKNxLF89MGPW874Qg+T3PvCj8vq/0MQA/kCw5A8BwTBcHPVEcIvjE0KvxFMMv/F'
            'kOwNF8QBOJ47xlGkZxqG4vkPHMdx1HgjjeS8gSFIMhiuP5TyPJMkSUM5HlvJ0oSf'
            'KI7k+Y6AgA=='
        ),
        'pixels': base64.b64decode(
            'AgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhISEhIiIiIiMjIyMkJCQkJSAgICAhIS'
            'EhIiIiIiMjIyMkJCQkJSCwsLCxsbGxsrKysrOzs7O0tLS0tbCwsLCxsbGxsrKysr'
            'Ozs7O0tLS0tbCwsLCxsbGxsrKysrOzs7O0tLS0tbFBQUFCQkJCQ0NDQ0RERERFRU'
            'VFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkFBQUFCQkJCQ0NDQ0RERERFRUVFRkHR0d'
            'HS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09PT09TU1NTV1dXV1tHR0dHS0tLS09'
            'PT09TU1NTV1dXV1tJiYmJjY2NjZGRkZGVlZWVmZmZmZ2'
        ),
    },
    'rgb_deflate': {
        'size': (21, 13),
        'channels': 3,
        'provenance': 'JDK javax.imageio TIFF writer, type=rgb, compression=Deflate',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAADAAAAoAED'
            'AAMAAAABgLIAAAEGAAMAAAABAAIAAAERAAQAAAABAAAAuAEVAAMAAAABAAMAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAAlgEaAAUAAAABAAAAqAEbAAUAAAABAAAAsAEo'
            'AAMAAAABAAEAAAAAAAAAAAAIAAgACAABAAAAAQAAAAEAAAABAAAAAXjaY9YOZoYh'
            'YetkOFL2LoYj4+hmOHLOngxHwdWLmQdUO49JDBzJuOTAkU5IDRzZpPTAkU/JHDiK'
            'aVkzsNpFbVPhSNW3FI5MY1vhyDV3KhyF1i6Fo9TerQOrXc4tD470wurgyC6tD478'
            'yubBUVzbOjjKm7ZvYLWr+5fDkXl8Oxy550+Ho/D65XCU3r8djsrnHwcAreIoC77X'
            'cbndqli7zWcdfbBkcDZ8phbdl8QFR6Zc1nM3nRKTTrodHotINS6hdRqtTqyKbUrr'
            '9jsNkVT6pdtuNvuTKjVrneBn83pOJptFq+RrdTsuZtNhuehu9vvd/ws91+Lpe1yd'
            'Z3ebs/B0d14+oHiMbvN6PP6RcVj97ff7vgPjMjvp9vr9ycdk9+/6/j/C8QxXQFAk'
            'BwKNxLF89MGPW874Qg+T3PvCj8vq/0MQA/kCw5A8BwTBcHPVEcIvjE0KvxFMMv/F'
            'kOwNF8QBOJ47xlGkZxqG4vkPHMdx1HgjjeS8gSFIMhiuP5TyPJMkSUM5HlvJ0oSf'
            'KI7k+Y6AgA=='
        ),
        'pixels': base64.b64decode(
            'AytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uD'
            'Q2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tz'
            'I0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztj'
            'EztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujDDRc'
            'DDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHSc'
            'THScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8'
            'PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERs'
            'HERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsFT1lFT1l'
            'FT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2l'
            'VX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2V'
            'RW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11'
            'NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21HkZuHkZuHkZu'
            'HkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoau'
            'Xoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnae'
            'TnaeTnaeXoauXoauXoauXoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaO'
            'PmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoauXoaubpa+J093J093J093J093'
            'N1+HN1+HN1+HN1+HR2+XR2+XR2+XR2+XV3+nV3+nV3+nV3+nZ4+3Z4+3Z4+3Z4+3'
            'd5/H'
        ),
    },
    'rgb_lzw': {
        'size': (21, 13),
        'channels': 3,
        'provenance': 'JDK javax.imageio TIFF writer, type=rgb, compression=LZW',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAADAAAAoAED'
            'AAMAAAABAAUAAAEGAAMAAAABAAIAAAERAAQAAAABAAAAuAEVAAMAAAABAAMAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAABjwEaAAUAAAABAAAAqAEbAAUAAAABAAAAsAEo'
            'AAMAAAABAAEAAAAAAAAAAAAIAAgACAABAAAAAQAAAAEAAAABAAAAAYAAxWU4FBIH'
            'BQmOzHCYXCoYIyWc4hEojExmW0HF4zGI0QzWk49II/ISme1HBZRB4HDJZDoVE5hF'
            'YjGppHIxIZxI4/JZPKoNP5bDaFMYpRZrG6ROZFS54DBoXKdUKfUQ4RDZVavVqwLC'
            'ofK5Xq7Xx4ZEZY7LZLMTDonLVbLXbS4hFZUbpU6fWLxWqtX75Ya7ZsBaLJbcJb7X'
            'cbndqli7zWcdfbBkcDZ8phbdl8QFR6Zc1nM3nRKTTrodHotINS6hdRqtTqyKbUrr'
            '9jsNkVT6pdtuNvuTKjVrneBn83pOJptFq+RrdTsuZtNhuehu9vvd/ws91+Lpe1yd'
            'Z3ebs/B0d14+oHiMbvN6PP6RcVj97ff7vgPjMjvp9vr9ycdk9+/6/j/C8QxXQFAk'
            'BwKNxLF89MGPW874Qg+T3PvCj8vq/0MQA/kCw5A8BwTBcHPVEcIvjE0KvxFMMv/F'
            'kOwNF8QBOJ47xlGkZxqG4vkPHMdx1HgjjeS8gSFIMhiuP5TyPJMkSUM5HlvJ0oSf'
            'KI7k+Y6AgA=='
        ),
        'pixels': base64.b64decode(
            'AytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uD'
            'Q2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tz'
            'I0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztj'
            'EztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujDDRc'
            'DDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHSc'
            'THScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8'
            'PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERs'
            'HERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsFT1lFT1l'
            'FT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2l'
            'VX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2V'
            'RW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11'
            'NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21HkZuHkZuHkZu'
            'HkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoau'
            'Xoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnae'
            'TnaeTnaeXoauXoauXoauXoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaO'
            'PmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoauXoaubpa+J093J093J093J093'
            'N1+HN1+HN1+HN1+HR2+XR2+XR2+XR2+XV3+nV3+nV3+nV3+nZ4+3Z4+3Z4+3Z4+3'
            'd5/H'
        ),
    },
    'rgb_none': {
        'size': (21, 13),
        'channels': 3,
        'provenance': 'JDK javax.imageio TIFF writer, type=rgb, compression=None',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAADAAAAoAED'
            'AAMAAAABAAEAAAEGAAMAAAABAAIAAAERAAQAAAABAAAAuAEVAAMAAAABAAMAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAADMwEaAAUAAAABAAAAqAEbAAUAAAABAAAAsAEo'
            'AAMAAAABAAEAAAAAAAAAAAAIAAgACAABAAAAAQAAAAEAAAABAAAAAQQPGiMuOUJN'
            'WGFsd4CLlp+qtb7J1N3o8/wHEhsmMTpFUFlkb3iDjpeirbbBzNXg6/T/ChMeKTI9'
            'SFFcZ3B7hhUgKzQ/SlNeaXJ9iJGcp7C7xs/a5e75BA0YIyw3QktWYWp1gImUn6iz'
            'vsfS3ebx/AUQGyQvOkNOWWJteIGMlyYxPEVQW2RveoOOmaKtuMHM1+Dr9v8KFR4p'
            'ND1IU1xncnuGkZqlsLnEz9jj7vcCDRYhLDVAS1RfanN+iZKdqDdCTVZhbHWAi5Sf'
            'qrO+ydLd6PH8BxAbJi86RU5ZZG14g4yXoqu2wcrV4On0/wgTHicyPUZRXGVwe4SP'
            'mqOuuUhTXmdyfYaRnKWwu8TP2uPu+QINGCEsN0BLVl9qdX6JlJ2os7zH0tvm8foF'
            'EBkkLzhDTldibXaBjJWgq7S/yllkb3iDjpeirbbBzNXg6/T/ChMeKTI9SFFcZ3B7'
            'ho+apa65xM3Y4+z3AgsWISo1QElUX2hzfoeSnaaxvMXQ22p1gImUn6izvsfS3ebx'
            '/AUQGyQvOkNOWWJteIGMl6Crtr/K1d7p9P0IExwnMjtGUVplcHmEj5ijrrfCzdbh'
            '7HuGkZqlsLnEz9jj7vcCDRYhLDVAS1RfanN+iZKdqLG8x9Db5u/6BQ4ZJC04Q0xX'
            'Ymt2gYqVoKm0v8jT3ufy/YyXoqu2wcrV4On0/wgTHicyPUZRXGVwe4SPmqOuucLN'
            '2OHs9wALFh8qNT5JVF1oc3yHkpumsbrF0Nnk7/gDDp2os7zH0tvm8foFEBkkLzhD'
            'TldibXaBjJWgq7S/ytPe6fL9CBEcJzA7Rk9aZW55hI2Yo6y3wsvW4er1AAkUH665'
            'xM3Y4+z3AgsWISo1QElUX2hzfoeSnaaxvMXQ2+Tv+gMOGSItOEFMV2Brdn+KlZ6p'
            'tL3I09zn8vsGERolML/K1d7p9P0IExwnMjtGUVplcHmEj5ijrrfCzdbh7PUACxQf'
            'KjM+SVJdaHF8h5Cbpq+6xc7Z5O34AwwXIis2QdDb5u/6BQ4ZJC04Q0xXYmt2gYqV'
            'oKm0v8jT3ufy/QYRHCUwO0RPWmNueYKNmKGst8DL1t/q9f4JFB0oMzxHUrdnj7dn'
            'j7dnj7d3n8c='
        ),
        'pixels': base64.b64decode(
            'BA8aIy45Qk1YYWx3gIuWn6q1vsnU3ejz/AcSGyYxOkVQWWRveIOOl6KttsHM1eDr'
            '9P8KEx4pMj1IUVxncHuGFSArND9KU15pcn2IkZynsLvGz9rl7vkEDRgjLDdCS1Zh'
            'anWAiZSfqLO+x9Ld5vH8BRAbJC86Q05ZYm14gYyXJjE8RVBbZG96g46Zoq24wczX'
            '4Ov2/woVHik0PUhTXGdye4aRmqWwucTP2OPu9wINFiEsNUBLVF9qc36Jkp2oN0JN'
            'VmFsdYCLlJ+qs77J0t3o8fwHEBsmLzpFTllkbXiDjJeiq7bBytXg6fT/CBMeJzI9'
            'RlFcZXB7hI+ao665SFNeZ3J9hpGcpbC7xM/a4+75Ag0YISw3QEtWX2p1fomUnaiz'
            'vMfS2+bx+gUQGSQvOENOV2JtdoGMlaCrtL/KWWRveIOOl6KttsHM1eDr9P8KEx4p'
            'Mj1IUVxncHuGj5qlrrnEzdjj7PcCCxYhKjVASVRfaHN+h5KdprG8xdDbanWAiZSf'
            'qLO+x9Ld5vH8BRAbJC86Q05ZYm14gYyXoKu2v8rV3un0/QgTHCcyO0ZRWmVweYSP'
            'mKOut8LN1uHse4aRmqWwucTP2OPu9wINFiEsNUBLVF9qc36Jkp2osbzH0Nvm7/oF'
            'DhkkLThDTFdia3aBipWgqbS/yNPe5/L9jJeiq7bBytXg6fT/CBMeJzI9RlFcZXB7'
            'hI+ao665ws3Y4ez3AAsWHyo1PklUXWhzfIeSm6axusXQ2eTv+AMOnaizvMfS2+bx'
            '+gUQGSQvOENOV2JtdoGMlaCrtL/K097p8v0IERwnMDtGT1plbnmEjZijrLfCy9bh'
            '6vUACRQfrrnEzdjj7PcCCxYhKjVASVRfaHN+h5KdprG8xdDb5O/6Aw4ZIi04QUxX'
            'YGt2f4qVnqm0vcjT3Ofy+wYRGiUwv8rV3un0/QgTHCcyO0ZRWmVweYSPmKOut8LN'
            '1uHs9QALFB8qMz5JUl1ocXyHkJumr7rFztnk7fgDDBciKzZB0Nvm7/oFDhkkLThD'
            'TFdia3aBipWgqbS/yNPe5/L9BhEcJTA7RE9aY255go2Yoay3wMvW3+r1/gkUHSgz'
            'PEdS'
        ),
    },
    'rgb_packbits': {
        'size': (21, 13),
        'channels': 3,
        'provenance': 'JDK javax.imageio TIFF writer, type=rgb, compression=PackBits',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAADAAAAoAED'
            'AAMAAAABgAUAAAEGAAMAAAABAAIAAAERAAQAAAABAAAAuAEVAAMAAAABAAMAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAADQAEaAAUAAAABAAAAqAEbAAUAAAABAAAAsAEo'
            'AAMAAAABAAEAAAAAAAAAAAAIAAgACAABAAAAAQAAAAEAAAABAAAAAT4DK1MDK1MD'
            'K1MDK1MTO2MTO2MTO2MTO2MjS3MjS3MjS3MjS3MzW4MzW4MzW4MzW4NDa5NDa5ND'
            'a5NDa5NTe6M+AytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tzI0tzM1uD'
            'M1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujPgMrUwMrUwMrUwMrUxM7YxM7YxM7YxM7'
            'YyNLcyNLcyNLcyNLczNbgzNbgzNbgzNbg0Nrk0Nrk0Nrk0Nrk1N7oz4MNFwMNFwM'
            'NFwMNFwcRGwcRGwcRGwcRGwsVHwsVHwsVHwsVHw8ZIw8ZIw8ZIw8ZIxMdJxMdJxM'
            'dJxMdJxchKw+DDRcDDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8PGSM'
            'PGSMPGSMPGSMTHScTHScTHScTHScXISsPgw0XAw0XAw0XAw0XBxEbBxEbBxEbBxE'
            'bCxUfCxUfCxUfCxUfDxkjDxkjDxkjDxkjEx0nEx0nEx0nEx0nFyErD4VPWUVPWUV'
            'PWUVPWUlTXUlTXUlTXUlTXU1XYU1XYU1XYU1XYVFbZVFbZVFbZVFbZVVfaVVfaVV'
            'faVVfaVljbU+FT1lFT1lFT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2V'
            'RW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21PhU9ZRU9ZRU9ZRU9ZSVNdSVNdSVNdSVN'
            'dTVdhTVdhTVdhTVdhUVtlUVtlUVtlUVtlVV9pVV9pVV9pVV9pWWNtT4eRm4eRm4e'
            'Rm4eRm4uVn4uVn4uVn4uVn4+Zo4+Zo4+Zo4+Zo5Odp5Odp5Odp5Odp5ehq5ehq5e'
            'hq5ehq5ulr4+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnae'
            'TnaeTnaeTnaeXoauXoauXoauXoaubpa+Ph5Gbh5Gbh5Gbh5Gbi5Wfi5Wfi5Wfi5W'
            'fj5mjj5mjj5mjj5mjk52nk52nk52nk52nl6Grl6Grl6Grl6Grm6Wvj4nT3cnT3cn'
            'T3cnT3c3X4c3X4c3X4c3X4dHb5dHb5dHb5dHb5dXf6dXf6dXf6dXf6dnj7dnj7dn'
            'j7dnj7d3n8c='
        ),
        'pixels': base64.b64decode(
            'AytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uD'
            'Q2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tz'
            'I0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztj'
            'EztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujDDRc'
            'DDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHSc'
            'THScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8'
            'PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERs'
            'HERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsFT1lFT1l'
            'FT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2l'
            'VX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2V'
            'RW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11'
            'NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21HkZuHkZuHkZu'
            'HkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoau'
            'Xoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnae'
            'TnaeTnaeXoauXoauXoauXoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaO'
            'PmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoauXoaubpa+J093J093J093J093'
            'N1+HN1+HN1+HN1+HR2+XR2+XR2+XR2+XV3+nV3+nV3+nV3+nZ4+3Z4+3Z4+3Z4+3'
            'd5/H'
        ),
    },
    'rgb_zlib': {
        'size': (21, 13),
        'channels': 3,
        'provenance': 'JDK javax.imageio TIFF writer, type=rgb, compression=ZLib',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADAEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAADAAAAoAED'
            'AAMAAAABAAgAAAEGAAMAAAABAAIAAAERAAQAAAABAAAAuAEVAAMAAAABAAMAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAAlgEaAAUAAAABAAAAqAEbAAUAAAABAAAAsAEo'
            'AAMAAAABAAEAAAAAAAAAAAAIAAgACAABAAAAAQAAAAEAAAABAAAAAXjaY9YOZoYh'
            'YetkOFL2LoYj4+hmOHLOngxHwdWLmQdUO49JDBzJuOTAkU5IDRzZpPTAkU/JHDiK'
            'aVkzsNpFbVPhSNW3FI5MY1vhyDV3KhyF1i6Fo9TerQOrXc4tD470wurgyC6tD478'
            'yubBUVzbOjjKm7ZvYLWr+5fDkXl8Oxy550+Ho/D65XCU3r8djsrnHwcAreIoC77X'
            'cbndqli7zWcdfbBkcDZ8phbdl8QFR6Zc1nM3nRKTTrodHotINS6hdRqtTqyKbUrr'
            '9jsNkVT6pdtuNvuTKjVrneBn83pOJptFq+RrdTsuZtNhuehu9vvd/ws91+Lpe1yd'
            'Z3ebs/B0d14+oHiMbvN6PP6RcVj97ff7vgPjMjvp9vr9ycdk9+/6/j/C8QxXQFAk'
            'BwKNxLF89MGPW874Qg+T3PvCj8vq/0MQA/kCw5A8BwTBcHPVEcIvjE0KvxFMMv/F'
            'kOwNF8QBOJ47xlGkZxqG4vkPHMdx1HgjjeS8gSFIMhiuP5TyPJMkSUM5HlvJ0oSf'
            'KI7k+Y6AgA=='
        ),
        'pixels': base64.b64decode(
            'AytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uD'
            'Q2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztjEztjEztjI0tzI0tzI0tz'
            'I0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujAytTAytTAytTAytTEztjEztj'
            'EztjEztjI0tzI0tzI0tzI0tzM1uDM1uDM1uDM1uDQ2uTQ2uTQ2uTQ2uTU3ujDDRc'
            'DDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHSc'
            'THScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERsHERsLFR8LFR8LFR8LFR8'
            'PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsDDRcDDRcDDRcDDRcHERsHERsHERs'
            'HERsLFR8LFR8LFR8LFR8PGSMPGSMPGSMPGSMTHScTHScTHScTHScXISsFT1lFT1l'
            'FT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2l'
            'VX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11NV2FNV2FNV2FNV2FRW2V'
            'RW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21FT1lFT1lFT1lFT1lJU11JU11JU11JU11'
            'NV2FNV2FNV2FNV2FRW2VRW2VRW2VRW2VVX2lVX2lVX2lVX2lZY21HkZuHkZuHkZu'
            'HkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoau'
            'Xoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaOPmaOPmaOPmaOTnaeTnae'
            'TnaeTnaeXoauXoauXoauXoaubpa+HkZuHkZuHkZuHkZuLlZ+LlZ+LlZ+LlZ+PmaO'
            'PmaOPmaOPmaOTnaeTnaeTnaeTnaeXoauXoauXoauXoaubpa+J093J093J093J093'
            'N1+HN1+HN1+HN1+HR2+XR2+XR2+XR2+XV3+nV3+nV3+nV3+nZ4+3Z4+3Z4+3Z4+3'
            'd5/H'
        ),
    },
    'rgba_lzw': {
        'size': (21, 13),
        'channels': 4,
        'provenance': 'JDK javax.imageio TIFF writer, type=rgba, compression=LZW',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADQEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAAEAAAArAED'
            'AAMAAAABAAUAAAEGAAMAAAABAAIAAAERAAQAAAABAAAAxAEVAAMAAAABAAQAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAACBQEaAAUAAAABAAAAtAEbAAUAAAABAAAAvAEo'
            'AAMAAAABAAEAAAFSAAMAAAABAAIAAAAAAAAAAQAIAAgACAAIAAAAAQAAAAEAAAAB'
            'AAAAAYABhcVj9AoJBoLAz8Fh8ZkdDIdEIfDUcJicdk9FoxGozF08Ni8hldIJFJJH'
            'IVcRjcll9KpZLpbK19BFMzoRN4VCIlO4pEo5P49HJNQ5RJphR5lMJpNpzTYPCp5E'
            'Z7FKBG6DHqJJaLKKRL6TMqWDxuX0PYrJZrLY0OHyOb0vbLdcLfbUuLyuf1Pdrxer'
            'zd1OPzOj1vgMFhMHgVuTzun2PisZjsbi2PZFe17Rl7VaLlm7pcr5n79fMNo8Rhsh'
            'p8lkMplszrbPas5cc7dNBe9DftJhdLiNRj9TktWGCAaEhwuJxuLw0gKCgeFBzOd0'
            'OfzVAODAiFh1ux2uz11gSDgmGB4PF5PH4WAWEAqGh6vZ7vb62hxFw4OR9+VyOl++'
            'p0u4/7vO480BvQ8z4QO+T4Po+z8wa47lP46L+upADtwC70CPLAr0QQ98EvlBYQiS'
            'OJMxFEkTRLEZMhiLJAlTFkXRhF8WlSII0kiXMbRxHUcxuXIojyUJkyBIUiSHIJkj'
            'CRJYmzJUmSdJslmzEhgnTFErxVFEZS3GkZR5L8fR5I0xyRI0oTPKUoSpK0szbE8V'
            'S5GMuxpMEdzDH0ySLMskTRJ80ylNYVCkPRRUFQlDULQZRB0MRFFlRlHUhR9GlkJQ'
            '5E0YVLUxTVM0uYQtEEVRpVBUVSVHUJpDUSRdHFVVWVdVtVnFQhlHkgLT3unn8v0I'
            'BhEcJyUwO0ZET1plY255hIKNmKOhrLfCwMvW4d/q9QD+CRQfHSgzPjxHUl1bZnF8'
            'eoWQm5mkr7q4w87Z1+Lt+HyHkp2bprG8usXQ29nk7/r4Aw4ZFyItODZBTFdVYGt2'
            'dH+KlZOeqbSyvcjT0dzn8vD7BhEPGiUwLjlET01YY25sd4KNi5ahrKq1wMvJ1N/q'
            '6PP+CY2Yo66st8LNy9bh7Or1AAsJFB8qKDM+SUdSXWhmcXyHhZCbpqSvusXDztnk'
            '4u34AwEMFyIgKzZBP0pVYF5pdH99iJOenKeyvbvG0dza5fD7+QQPGp6ptL+9yNPe'
            '3Ofy/fsGERwaJTA7OURPWlhjbnl3go2YlqGst7XAy9bU3+r18/4JFBIdKDMxPEdS'
            'UFtmcW96hZCOmaSvrbjDzszX4u3r9gEMChUgK6+6xdDO2eTv7fgDDgwXIi0rNkFM'
            'SlVga2l0f4qIk56pp7K9yMbR3Ofl8PsGBA8aJSMuOURCTVhjYWx3goCLlqGfqrXA'
            'vsnU393o8/78BxIdGyYxPMDL1uHf6vUA/gkUHx0oMz48R1JdW2ZxfHqFkJuZpK+6'
            'uMPO2dfi7fj2AQwXFSArNjQ/SlVTXml0cn2Ik5Gcp7Kwu8bRz9rl8O75BA8NGCMu'
            'LDdCTdHc5/Lw+wYRDxolMC45RE9NWGNubHeCjYuWoayqtcDLydTf6ujz/gkHEh0o'
            'JjE8R0VQW2Zkb3qFg46ZpKKtuMPBzNfi4Ov2Af8KFSAeKTQ/PUhTXg=='
        ),
        'pixels': base64.b64decode(
            'Bi5WfgYuVn4GLlZ+Bi5WfhY+Zo4WPmaOFj5mjhY+Zo4mTnaeJk52niZOdp4mTnae'
            'Nl6GrjZehq42XoauNl6GrkZulr5Gbpa+Rm6WvkZulr5WfqbOBi5WfgYuVn4GLlZ+'
            'Bi5WfhY+Zo4WPmaOFj5mjhY+Zo4mTnaeJk52niZOdp4mTnaeNl6GrjZehq42Xoau'
            'Nl6GrkZulr5Gbpa+Rm6WvkZulr5WfqbOBi5WfgYuVn4GLlZ+Bi5WfhY+Zo4WPmaO'
            'Fj5mjhY+Zo4mTnaeJk52niZOdp4mTnaeNl6GrjZehq42XoauNl6GrkZulr5Gbpa+'
            'Rm6WvkZulr5WfqbODzdfhw83X4cPN1+HDzdfhx9Hb5cfR2+XH0dvlx9Hb5cvV3+n'
            'L1d/py9Xf6cvV3+nP2ePtz9nj7c/Z4+3P2ePt093n8dPd5/HT3efx093n8dfh6/X'
            'Dzdfhw83X4cPN1+HDzdfhx9Hb5cfR2+XH0dvlx9Hb5cvV3+nL1d/py9Xf6cvV3+n'
            'P2ePtz9nj7c/Z4+3P2ePt093n8dPd5/HT3efx093n8dfh6/XDzdfhw83X4cPN1+H'
            'Dzdfhx9Hb5cfR2+XH0dvlx9Hb5cvV3+nL1d/py9Xf6cvV3+nP2ePtz9nj7c/Z4+3'
            'P2ePt093n8dPd5/HT3efx093n8dfh6/XGEBokBhAaJAYQGiQGEBokChQeKAoUHig'
            'KFB4oChQeKA4YIiwOGCIsDhgiLA4YIiwSHCYwEhwmMBIcJjASHCYwFiAqNBYgKjQ'
            'WICo0FiAqNBokLjgGEBokBhAaJAYQGiQGEBokChQeKAoUHigKFB4oChQeKA4YIiw'
            'OGCIsDhgiLA4YIiwSHCYwEhwmMBIcJjASHCYwFiAqNBYgKjQWICo0FiAqNBokLjg'
            'GEBokBhAaJAYQGiQGEBokChQeKAoUHigKFB4oChQeKA4YIiwOGCIsDhgiLA4YIiw'
            'SHCYwEhwmMBIcJjASHCYwFiAqNBYgKjQWICo0FiAqNBokLjgIUlxmSFJcZkhSXGZ'
            'IUlxmTFZgakxWYGpMVmBqTFZgalBaZG5QWmRuUFpkblBaZG5UXmhyVF5oclReaHJ'
            'UXmhyWGJsdlhibHZYYmx2WGJsdlxmcHpIUlxmSFJcZkhSXGZIUlxmTFZgakxWYGp'
            'MVmBqTFZgalBaZG5QWmRuUFpkblBaZG5UXmhyVF5oclReaHJUXmhyWGJsdlhibHZ'
            'YYmx2WGJsdlxmcHpIUlxmSFJcZkhSXGZIUlxmTFZgakxWYGpMVmBqTFZgalBaZG5'
            'QWmRuUFpkblBaZG5UXmhyVF5oclReaHJUXmhyWGJsdlhibHZYYmx2WGJsdlxmcHp'
            'KlJ6oipSeqIqUnqiKlJ6ojpiirI6YoqyOmKKsjpiirJKcprCSnKawkpymsJKcprC'
            'WoKq0lqCqtJagqrSWoKq0mqSuuJqkrriapK64mqSuuJ6osry'
        ),
    },
    'rgba_none': {
        'size': (21, 13),
        'channels': 4,
        'provenance': 'JDK javax.imageio TIFF writer, type=rgba, compression=None',
        'payload': base64.b64decode(
            'TU0AKgAAAAgADQEAAAMAAAABABUAAAEBAAMAAAABAA0AAAECAAMAAAAEAAAArAED'
            'AAMAAAABAAEAAAEGAAMAAAABAAIAAAERAAQAAAABAAAAxAEVAAMAAAABAAQAAAEW'
            'AAMAAAABAA0AAAEXAAQAAAABAAAERAEaAAUAAAABAAAAtAEbAAUAAAABAAAAvAEo'
            'AAMAAAABAAEAAAFSAAMAAAABAAIAAAAAAAAAAQAIAAgACAAIAAAAAQAAAAEAAAAB'
            'AAAAAQUQGyYkLzpFQ05ZZGJteIOBjJeioKu2wb/K1eDe6fT//QgTHhwnMj07RlFc'
            'WmVwe3mEj5qYo665t8LN2Nbh7Pf1AAsWFB8qNTM+SVRSXWhzcXyHkhYhLDc1QEtW'
            'VF9qdXN+iZSSnaizsbzH0tDb5vHv+gUQDhkkLy04Q05MV2Jta3aBjIqVoKuptL/K'
            'yNPe6efy/QgGERwnJTA7RkRPWmVjbnmEgo2YoycyPUhGUVxnZXB7hoSPmqWjrrnE'
            'ws3Y4+Hs9wIACxYhHyo1QD5JVF9daHN+fIeSnZumsby6xdDb2eTv+vgDDhkXIi04'
            'NkFMV1Vga3Z0f4qVk56ptDhDTllXYm14doGMl5Wgq7a0v8rV097p9PL9CBMRHCcy'
            'MDtGUU9aZXBueYSPjZijrqy3ws3L1uHs6vUACwkUHyooMz5JR1JdaGZxfIeFkJum'
            'pK+6xUlUX2poc36Jh5KdqKaxvMfF0Nvm5O/6BQMOGSQiLThDQUxXYmBrdoF/ipWg'
            'nqm0v73I097c5/L9+wYRHBolMDs5RE9aWGNueXeCjZiWoay3tcDL1lplcHt5hI+a'
            'mKOuubfCzdjW4ez39QALFhQfKjUzPklUUl1oc3F8h5KQm6axr7rF0M7Z5O/t+AMO'
            'DBciLSs2QUxKVWBraXR/ioiTnqmnsr3IxtHc52t2gYyKlaCrqbS/ysjT3unn8v0I'
            'BhEcJyUwO0ZET1plY255hIKNmKOhrLfCwMvW4d/q9QD+CRQfHSgzPjxHUl1bZnF8'
            'eoWQm5mkr7q4w87Z1+Lt+HyHkp2bprG8usXQ29nk7/r4Aw4ZFyItODZBTFdVYGt2'
            'dH+KlZOeqbSyvcjT0dzn8vD7BhEPGiUwLjlET01YY25sd4KNi5ahrKq1wMvJ1N/q'
            '6PP+CY2Yo66st8LNy9bh7Or1AAsJFB8qKDM+SUdSXWhmcXyHhZCbpqSvusXDztnk'
            '4u34AwEMFyIgKzZBP0pVYF5pdH99iJOenKeyvbvG0dza5fD7+QQPGp6ptL+9yNPe'
            '3Ofy/fsGERwaJTA7OURPWlhjbnl3go2YlqGst7XAy9bU3+r18/4JFBIdKDMxPEdS'
            'UFtmcW96hZCOmaSvrbjDzszX4u3r9gEMChUgK6+6xdDO2eTv7fgDDgwXIi0rNkFM'
            'SlVga2l0f4qIk56pp7K9yMbR3Ofl8PsGBA8aJSMuOURCTVhjYWx3goCLlqGfqrXA'
            'vsnU393o8/78BxIdGyYxPMDL1uHf6vUA/gkUHx0oMz48R1JdW2ZxfHqFkJuZpK+6'
            'uMPO2dfi7fj2AQwXFSArNjQ/SlVTXml0cn2Ik5Gcp7Kwu8bRz9rl8O75BA8NGCMu'
            'LDdCTdHc5/Lw+wYRDxolMC45RE9NWGNubHeCjYuWoayqtcDLydTf6ujz/gkHEh0o'
            'JjE8R0VQW2Zkb3qFg46ZpKKtuMPBzNfi4Ov2Af8KFSAeKTQ/PUhTXg=='
        ),
        'pixels': base64.b64decode(
            'BRAbJiQvOkVDTllkYm14g4GMl6Kgq7bBv8rV4N7p9P/9CBMeHCcyPTtGUVxaZXB7'
            'eYSPmpijrrm3ws3Y1uHs9/UACxYUHyo1Mz5JVFJdaHNxfIeSFiEsNzVAS1ZUX2p1'
            'c36JlJKdqLOxvMfS0Nvm8e/6BRAOGSQvLThDTkxXYm1rdoGMipWgq6m0v8rI097p'
            '5/L9CAYRHCclMDtGRE9aZWNueYSCjZijJzI9SEZRXGdlcHuGhI+apaOuucTCzdjj'
            '4ez3AgALFiEfKjVAPklUX11oc358h5Kdm6axvLrF0NvZ5O/6+AMOGRciLTg2QUxX'
            'VWBrdnR/ipWTnqm0OENOWVdibXh2gYyXlaCrtrS/ytXT3un08v0IExEcJzIwO0ZR'
            'T1plcG55hI+NmKOurLfCzcvW4ezq9QALCRQfKigzPklHUl1oZnF8h4WQm6akr7rF'
            'SVRfamhzfomHkp2oprG8x8XQ2+bk7/oFAw4ZJCItOENBTFdiYGt2gX+KlaCeqbS/'
            'vcjT3tzn8v37BhEcGiUwOzlET1pYY255d4KNmJahrLe1wMvWWmVwe3mEj5qYo665'
            't8LN2Nbh7Pf1AAsWFB8qNTM+SVRSXWhzcXyHkpCbprGvusXQztnk7+34Aw4MFyIt'
            'KzZBTEpVYGtpdH+KiJOeqaeyvcjG0dzna3aBjIqVoKuptL/KyNPe6efy/QgGERwn'
            'JTA7RkRPWmVjbnmEgo2Yo6Gst8LAy9bh3+r1AP4JFB8dKDM+PEdSXVtmcXx6hZCb'
            'maSvurjDztnX4u34fIeSnZumsby6xdDb2eTv+vgDDhkXIi04NkFMV1Vga3Z0f4qV'
            'k56ptLK9yNPR3Ofy8PsGEQ8aJTAuOURPTVhjbmx3go2LlqGsqrXAy8nU3+ro8/4J'
            'jZijrqy3ws3L1uHs6vUACwkUHyooMz5JR1JdaGZxfIeFkJumpK+6xcPO2eTi7fgD'
            'AQwXIiArNkE/SlVgXml0f32Ik56cp7K9u8bR3Nrl8Pv5BA8anqm0v73I097c5/L9'
            '+wYRHBolMDs5RE9aWGNueXeCjZiWoay3tcDL1tTf6vXz/gkUEh0oMzE8R1JQW2Zx'
            'b3qFkI6ZpK+tuMPOzNfi7ev2AQwKFSArr7rF0M7Z5O/t+AMODBciLSs2QUxKVWBr'
            'aXR/ioiTnqmnsr3IxtHc5+Xw+wYEDxolIy45REJNWGNhbHeCgIuWoZ+qtcC+ydTf'
            '3ejz/vwHEh0bJjE8wMvW4d/q9QD+CRQfHSgzPjxHUl1bZnF8eoWQm5mkr7q4w87Z'
            '1+Lt+PYBDBcVICs2ND9KVVNeaXRyfYiTkZynsrC7xtHP2uXw7vkEDw0YIy4sN0JN'
            '0dzn8vD7BhEPGiUwLjlET01YY25sd4KNi5ahrKq1wMvJ1N/q6PP+CQcSHSgmMTxH'
            'RVBbZmRveoWDjpmkoq24w8HM1+Lg6/YB/woVIB4pND89SFNe'
        ),
    },
}
