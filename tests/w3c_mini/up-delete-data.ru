PREFIX : <http://example/>
DELETE DATA { :s1 :p :o1 }
