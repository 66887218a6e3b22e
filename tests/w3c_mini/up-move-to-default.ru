PREFIX : <http://example/>
MOVE :g2 TO DEFAULT
