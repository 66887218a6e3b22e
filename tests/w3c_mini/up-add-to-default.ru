PREFIX : <http://example/>
ADD :g1 TO DEFAULT
