PREFIX : <http://example/>
CLEAR DEFAULT ;
ADD DEFAULT TO :g1
