PREFIX : <http://example/>
ADD :g1 TO :g1
